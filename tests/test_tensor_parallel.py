"""Tensor-parallel parameter placement (Megatron-style via GSPMD).

TP here is placement-only (parallel/tensor_parallel.py): these tests assert
that sharding attention heads / MLP hidden over a "tp" mesh axis leaves every
forward numerically equal to the replicated single-device path — including
the autoregressive sampler, which must compile tensor-parallel from the
input shardings alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from npe_pfn_tpu.models import TabICAConfig, TabICAModel
from npe_pfn_tpu.models import regressor
from npe_pfn_tpu.parallel import param_pspecs, tp_forward_logits, tp_place


def _model(num_heads=4, d_model=32):
    cfg = TabICAConfig(
        d_model=d_model, num_heads=num_heads, num_layers=2, max_features=8,
        num_bars=32, dtype="float32",
    )
    return TabICAModel.create(jax.random.PRNGKey(0), cfg)


def _data(n=48, f=3, q=16, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x_ctx = jax.random.normal(k1, (n, f))
    y_ctx = jax.random.normal(k2, (n,))
    x_qry = jax.random.normal(k3, (q, f))
    return x_ctx, y_ctx, x_qry


def test_param_pspecs_structure():
    model = _model()
    specs = param_pspecs(model.params)
    assert specs["blocks"]["row_attn"]["wq"] == P(None, None, "tp", None)
    assert specs["blocks"]["row_attn"]["wo"] == P(None, "tp", None, None)
    assert specs["blocks"]["feat_attn"]["wk"] == P(None, None, "tp", None)
    assert specs["blocks"]["mlp"]["w1"] == P(None, None, "tp")
    assert specs["blocks"]["mlp"]["w2"] == P(None, "tp", None)
    # Residual-stream biases and non-matmul params stay replicated.
    assert specs["blocks"]["mlp"]["b2"] == P()
    assert specs["embed"]["w_feat"] == P()
    assert specs["head"]["w2"] == P()
    # Same pytree structure as params (required for tree_map placement).
    assert jax.tree_util.tree_structure(specs) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: P(), model.params)
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_forward_matches_replicated():
    model = _model(num_heads=4)
    x_ctx, y_ctx, x_qry = _data()
    ref = regressor.predict_logits(
        model, regressor.fit_encode(model, x_ctx, y_ctx), x_qry
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    out = tp_forward_logits(mesh, model, x_ctx, y_ctx, x_qry)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_dp_mesh_forward():
    """tp×dp: matmuls split over tp while query rows ride the data axis."""
    model = _model(num_heads=2)
    x_ctx, y_ctx, x_qry = _data(q=32)
    ref = regressor.predict_logits(
        model, regressor.fit_encode(model, x_ctx, y_ctx), x_qry
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "tp"))
    out = tp_forward_logits(mesh, model, x_ctx, y_ctx, x_qry, data_axis="data")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_autoregressive_sample_matches():
    """The placed model is a drop-in for the sampler: same samples, same
    log-probs as the replicated model (identical PRNG path)."""
    from npe_pfn_tpu.estimator import autoregressive_sample

    model = _model(num_heads=4)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    theta_ctx = jax.random.normal(k1, (48, 2))
    x_ctx = jax.random.normal(k2, (48, 3))
    ctx_mask = jnp.ones((48,), bool)
    x_qry = jax.random.normal(k3, (16, 3))
    ref, ref_lp = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, jax.random.PRNGKey(4), 16
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    placed = tp_place(mesh, model)
    out, out_lp = autoregressive_sample(
        placed, theta_ctx, x_ctx, ctx_mask, x_qry, jax.random.PRNGKey(4), 16
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref_lp), np.asarray(out_lp), rtol=1e-4, atol=1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_requires_divisible_heads():
    model = _model(num_heads=2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with pytest.raises(ValueError, match="num_heads"):
        tp_place(mesh, model)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_row_pool_model():
    """Pool/unpool attention params shard like the other attention dicts."""
    cfg = TabICAConfig(
        d_model=32, num_heads=4, num_layers=2, max_features=8, num_bars=32,
        dtype="float32", row_pool_slots=4,
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    specs = param_pspecs(model.params)
    assert specs["blocks"]["pool"]["pool_attn"]["wq"] == P(None, None, "tp", None)
    assert specs["blocks"]["pool"]["slots"] == P()
    x_ctx, y_ctx, x_qry = _data()
    ref = regressor.predict_logits(
        model, regressor.fit_encode(model, x_ctx, y_ctx), x_qry
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    out = tp_forward_logits(mesh, model, x_ctx, y_ctx, x_qry)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-5)
