"""Transformer structural invariants: shapes, encode/decode ≡ joint forward,
query independence, column permutation invariance, masking correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor, transformer

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16, dtype="float32"
)


@pytest.fixture(scope="module")
def model():
    return TabICAModel.create(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def data():
    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 3)
    x_ctx = jax.random.normal(ks[0], (20, 8))
    y_ctx = jax.random.normal(ks[1], (20,))
    x_qry = jax.random.normal(ks[2], (7, 8))
    return x_ctx, y_ctx, x_qry


@pytest.mark.fast
def test_forward_shape(model, data):
    x_ctx, y_ctx, x_qry = data
    logits = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    assert logits.shape == (7, 16)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.fast
def test_encode_decode_matches_joint(model, data):
    x_ctx, y_ctx, x_qry = data
    joint = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    cache = transformer.encode_context(CFG, model.params, x_ctx, y_ctx)
    split = transformer.decode_queries(CFG, model.params, cache, x_qry)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(split), rtol=2e-4, atol=2e-5)


@pytest.mark.fast
def test_query_rows_independent(model, data):
    """Prediction for a query row must not depend on other query rows."""
    x_ctx, y_ctx, x_qry = data
    full = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    solo = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry[3:4])
    np.testing.assert_allclose(np.asarray(full[3]), np.asarray(solo[0]), rtol=2e-4, atol=2e-5)


def test_feature_permutation_invariance(model, data):
    """No column identity embeddings -> exact invariance to column shuffles
    (replaces TabPFN's feature-shuffle ensembling)."""
    x_ctx, y_ctx, x_qry = data
    perm = jnp.array([3, 1, 4, 0, 2, 7, 6, 5])
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    b = transformer.forward(CFG, model.params, x_ctx[:, perm], y_ctx, x_qry[:, perm])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.fast
def test_feature_mask_excludes_columns(model, data):
    """Masked feature columns must not influence predictions."""
    x_ctx, y_ctx, x_qry = data
    mask = jnp.array([True] * 5 + [False] * 3)
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry, feat_mask=mask)
    x_ctx2 = x_ctx.at[:, 5:].set(99.0)
    x_qry2 = x_qry.at[:, 5:].set(-99.0)
    b = transformer.forward(CFG, model.params, x_ctx2, y_ctx, x_qry2, feat_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_ctx_mask_excludes_rows(model, data):
    """Padded context rows must not influence predictions."""
    x_ctx, y_ctx, x_qry = data
    mask = jnp.arange(20) < 12
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry, ctx_mask=mask)
    x_ctx2 = x_ctx.at[12:].set(55.0)
    y_ctx2 = y_ctx.at[12:].set(-55.0)
    b = transformer.forward(CFG, model.params, x_ctx2, y_ctx2, x_qry, ctx_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    c = transformer.forward(CFG, model.params, x_ctx[:12], y_ctx[:12], x_qry)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5)


def test_regressor_predict_proba_shape(model):
    rng = jax.random.PRNGKey(3)
    x_ctx = jax.random.normal(rng, (30, 8))
    labels = (x_ctx[:, 0] > 0).astype(jnp.float32)
    x_qry = jax.random.normal(jax.random.PRNGKey(4), (5, 8))
    probs = regressor.predict_proba(model, x_ctx, labels, x_qry)
    assert probs.shape == (5, 2)
    p = np.asarray(probs)
    assert np.all(p >= 0) and np.all(p <= 1)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_checkpoint_roundtrip(model, data, tmp_path):
    from npe_pfn_tpu.models import checkpoint

    x_ctx, y_ctx, x_qry = data
    path = str(tmp_path / "m.npz")
    checkpoint.save(path, model)
    loaded = checkpoint.load(path)
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    b = transformer.forward(loaded.cfg, loaded.params, x_ctx, y_ctx, x_qry)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.fast
def test_scores_dtype_bf16_close_to_f32(model, data):
    """scores_dtype="bfloat16" narrows only the materialized score tensor
    (the HBM bottleneck of the train step, results/train_step_ab.json);
    softmax still reduces in f32, so outputs must track the f32 path within
    bf16 rounding of the logits."""
    import dataclasses

    x_ctx, y_ctx, x_qry = data
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    cfg_bf = dataclasses.replace(CFG, scores_dtype="bfloat16")
    b = transformer.forward(cfg_bf, model.params, x_ctx, y_ctx, x_qry)
    assert a.shape == b.shape
    pa = jax.nn.softmax(a, -1)
    pb = jax.nn.softmax(b, -1)
    assert float(jnp.abs(pa - pb).max()) < 5e-2
    assert float(jnp.abs(pa - pb).mean()) < 2e-3
