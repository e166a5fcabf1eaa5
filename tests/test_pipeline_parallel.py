"""Pipeline parallelism over the layer axis (parallel/pipeline.py).

The layer-stacked params shard over a "pp" mesh axis; activations hop
stages via ppermute. These tests assert exact equality with the
single-device encode/decode on the virtual CPU mesh, across stage counts,
microbatch counts, and masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor
from npe_pfn_tpu.parallel import pp_decode, pp_fit_encode


def _model(num_layers=4):
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=num_layers, max_features=8,
        num_bars=32, dtype="float32",
    )
    return TabICAModel.create(jax.random.PRNGKey(0), cfg)


def _data(n=40, f=3, q=24, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    return (
        jax.random.normal(k1, (n, f)),
        jax.random.normal(k2, (n,)),
        jax.random.normal(k3, (q, f)),
    )


def _ref_logits(model, x_ctx, y_ctx, x_qry, ctx_mask=None):
    fitted = regressor.fit_encode(model, x_ctx, y_ctx, ctx_mask=ctx_mask)
    return regressor.predict_logits(model, fitted, x_qry)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("n_pp,mbs", [(2, 4), (4, 3), (4, 1)])
def test_pp_matches_single_device(n_pp, mbs):
    model = _model(num_layers=4)
    x_ctx, y_ctx, x_qry = _data(q=24)
    ref = _ref_logits(model, x_ctx, y_ctx, x_qry)
    mesh = Mesh(np.array(jax.devices()[:n_pp]), ("pp",))
    fitted = pp_fit_encode(mesh, model, x_ctx, y_ctx)
    out = pp_decode(mesh, model, fitted, x_qry, num_microbatches=mbs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_pp_respects_ctx_mask():
    """Padded context rows must not influence the pipelined forward."""
    model = _model(num_layers=2)
    x_ctx, y_ctx, x_qry = _data(n=32, q=8)
    mask = jnp.arange(32) < 24
    ref = _ref_logits(
        model, x_ctx[:24], y_ctx[:24], x_qry
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    fitted = pp_fit_encode(mesh, model, x_ctx, y_ctx, ctx_mask=mask)
    out = pp_decode(mesh, model, fitted, x_qry, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_pp_sample_y_end_to_end():
    """The pp cache feeds the same bar-distribution heads downstream."""
    model = _model(num_layers=2)
    x_ctx, y_ctx, x_qry = _data()
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    fitted = pp_fit_encode(mesh, model, x_ctx, y_ctx)
    logits = pp_decode(mesh, model, fitted, x_qry, num_microbatches=2)
    y = regressor.sample_y(jax.random.PRNGKey(3), model, fitted, logits)
    assert y.shape == (x_qry.shape[0],)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_pp_requires_divisible_layers():
    model = _model(num_layers=3)
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    x_ctx, y_ctx, _ = _data()
    with pytest.raises(AssertionError, match="num_layers"):
        pp_fit_encode(mesh, model, x_ctx, y_ctx)
