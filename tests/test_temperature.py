"""Calibration-temperature tests (TabICAModel.temperature).

One scalar dividing the bar logits at prediction (models/regressor.py
predict_logits) — fitted post-hoc by scripts/fit_temperature.py on held-out
synthetic tasks (VERDICT r4 item 4: SBC found half the dims mis-calibrated).
τ=1 must be bit-exact with the pre-temperature model, and checkpoints must
round-trip τ (older checkpoints load as τ=1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from npe_pfn_tpu.models import TabICAConfig, TabICAModel
from npe_pfn_tpu.models import bar_distribution as bar
from npe_pfn_tpu.models import checkpoint as C
from npe_pfn_tpu.models import regressor

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
    dtype="float32",
)


def _fitted(model):
    k = jax.random.PRNGKey(0)
    x_ctx = jax.random.normal(k, (64, 8))
    y_ctx = jax.random.normal(jax.random.fold_in(k, 1), (64,))
    return regressor.fit_encode(model, x_ctx, y_ctx), x_ctx[:16]


def test_temperature_scales_logits():
    m1 = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    m2 = m1.replace(temperature=jnp.asarray(2.0))
    fitted, xq = _fitted(m1)
    l1 = regressor.predict_logits(m1, fitted, xq)
    l2 = regressor.predict_logits(m2, fitted, xq)
    assert np.allclose(np.asarray(l2), np.asarray(l1) / 2.0, rtol=1e-6)
    # τ>1 widens: density at the argmax bar drops, entropy rises
    p1 = jax.nn.softmax(l1, axis=-1)
    p2 = jax.nn.softmax(l2, axis=-1)
    ent = lambda p: -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
    assert bool(jnp.all(ent(p2) >= ent(p1) - 1e-6))


def test_temperature_one_is_identity():
    m = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    assert float(m.temperature) == 1.0
    fitted, xq = _fitted(m)
    logits = regressor.predict_logits(m, fitted, xq)
    raw = regressor.predict_logits(m.replace(temperature=jnp.asarray(1.0)),
                                   fitted, xq)
    assert np.array_equal(np.asarray(logits), np.asarray(raw))


def test_temperature_moves_log_prob_spread():
    """Sharper τ<1 raises density at the mode, lowers it in the tails —
    the mechanism the SBC fix relies on."""
    m = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    fitted, xq = _fitted(m)
    logits = regressor.predict_logits(m, fitted, xq)
    # mode of row 0's bar distribution (normalized space)
    mode_bar = int(jnp.argmax(logits[0]))
    centers = 0.5 * (m.borders[1:] + m.borders[:-1])
    y_mode = centers[mode_bar]
    lp_sharp = bar.log_prob(m.borders, logits[0] / 0.5, y_mode)
    lp_plain = bar.log_prob(m.borders, logits[0], y_mode)
    assert float(lp_sharp) > float(lp_plain)


def test_checkpoint_roundtrip_temperature(tmp_path):
    m = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    cal = m.replace(temperature=jnp.asarray(1.37))
    path = os.path.join(tmp_path, "cal.npz")
    C.save(path, cal)
    loaded = C.load(path)
    assert float(loaded.temperature) == np.float32(1.37)
    # params untouched by the reserved key
    for a, b in zip(jax.tree_util.tree_leaves(cal.params),
                    jax.tree_util.tree_leaves(loaded.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_old_checkpoint_loads_tau1(tmp_path):
    """Pre-round-5 checkpoints (no __temperature__ key) are the
    uncalibrated model."""
    import dataclasses
    import json

    m = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    path = os.path.join(tmp_path, "old.npz")
    flat, _ = jax.tree_util.tree_flatten_with_path(m.params)
    arrays = {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp):
            np.asarray(leaf)
        for kp, leaf in flat
    }
    np.savez_compressed(path, **arrays)
    with open(path + ".json", "w") as f:
        json.dump(dataclasses.asdict(m.cfg), f)
    loaded = C.load(path)
    assert float(loaded.temperature) == 1.0
