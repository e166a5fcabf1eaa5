"""Sequence-parallel (context-sharded) forward must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor
from npe_pfn_tpu.parallel.context_sharded import sp_decode, sp_fit_encode

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16, dtype="float32"
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sp_matches_single_device():
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    n, q = 64, 24
    x_ctx = jax.random.normal(ks[0], (n, 8))
    y_ctx = jax.random.normal(ks[1], (n,))
    x_qry = jax.random.normal(ks[2], (q, 8))
    ctx_mask = jnp.arange(n) < 50

    ref_fit = regressor.fit_encode(model, x_ctx, y_ctx, ctx_mask=ctx_mask)
    ref = regressor.predict_logits(model, ref_fit, x_qry)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "sp"))
    fitted = sp_fit_encode(mesh, model, x_ctx, y_ctx, ctx_mask=ctx_mask)
    out = sp_decode(mesh, model, fitted, x_qry)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_sp_only_mesh():
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x_ctx = jax.random.normal(ks[0], (32, 8))
    y_ctx = jax.random.normal(ks[1], (32,))
    x_qry = jax.random.normal(ks[2], (8, 8))
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    fitted = sp_fit_encode(mesh, model, x_ctx, y_ctx)
    out = sp_decode(mesh, model, fitted, x_qry, data_axis=None)
    ref_fit = regressor.fit_encode(model, x_ctx, y_ctx)
    ref = regressor.predict_logits(model, ref_fit, x_qry)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ring_attention_matches_single_device():
    """Ring-rotated K/V shards (ppermute, no gather) must reproduce the
    single-device forward up to online-softmax reassociation."""
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    n, q = 64, 16
    x_ctx = jax.random.normal(ks[0], (n, 8))
    y_ctx = jax.random.normal(ks[1], (n,))
    x_qry = jax.random.normal(ks[2], (q, 8))
    ctx_mask = jnp.arange(n) < 41  # padding lands mid-shard on the ring

    ref_fit = regressor.fit_encode(model, x_ctx, y_ctx, ctx_mask=ctx_mask)
    ref = regressor.predict_logits(model, ref_fit, x_qry)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "sp"))
    fitted = sp_fit_encode(mesh, model, x_ctx, y_ctx, ctx_mask=ctx_mask,
                           row_attn="ring")
    out = sp_decode(mesh, model, fitted, x_qry, row_attn="ring")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_eight_way():
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x_ctx = jax.random.normal(ks[0], (128, 8))
    y_ctx = jax.random.normal(ks[1], (128,))
    x_qry = jax.random.normal(ks[2], (8, 8))
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    fitted = sp_fit_encode(mesh, model, x_ctx, y_ctx, row_attn="ring")
    out = sp_decode(mesh, model, fitted, x_qry, data_axis=None, row_attn="ring")
    ref_fit = regressor.fit_encode(model, x_ctx, y_ctx)
    ref = regressor.predict_logits(model, ref_fit, x_qry)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
