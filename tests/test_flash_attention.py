"""Flash row-attention kernel parity vs the pure-jnp reference
(interpret mode on CPU; compiled parity runs on TPU via scripts/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.ops.flash_attention import flash_row_attention, reference_row_attention


@pytest.mark.parametrize("lq,lk", [(64, 64), (96, 160), (128, 512)])
def test_flash_matches_reference(lq, lk):
    b, h, hd = 3, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    mask = jnp.arange(lk) < (lk - 7)
    ref = reference_row_attention(q, k, v, mask)
    out = flash_row_attention(q, k, v, mask, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_all_masked_block():
    """Key blocks that are entirely padding must not produce NaNs."""
    b, h, hd, lq, lk = 1, 1, 32, 32, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    mask = jnp.arange(lk) < 16  # only first 16 rows real -> blocks 2.. empty
    out = flash_row_attention(q, k, v, mask, block_q=32, block_k=32, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    ref = reference_row_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_transformer_forward_with_flash_matches_xla():
    """Full forward with flash row-attention (interpret) vs XLA path."""
    from npe_pfn_tpu.models import TabICAConfig, TabICAModel, transformer

    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x_ctx = jax.random.normal(ks[0], (40, 8))
    y_ctx = jax.random.normal(ks[1], (40,))
    x_qry = jax.random.normal(ks[2], (16, 8))
    ctx_mask = jnp.arange(40) < 33
    ref = transformer.forward(cfg, model.params, x_ctx, y_ctx, x_qry, ctx_mask=ctx_mask)
    import dataclasses

    cfg_flash = dataclasses.replace(cfg, flash="on", flash_interpret=True)
    out = transformer.forward(
        cfg_flash, model.params, x_ctx, y_ctx, x_qry, ctx_mask=ctx_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_per_batch_mask():
    """kv_mask [B, Lk]: each batch row gets its own context validity."""
    b, h, hd, lq, lk = 4, 2, 32, 32, 96
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    mask = jnp.arange(lk)[None, :] < jnp.array([96, 50, 17, 80])[:, None]
    ref = reference_row_attention(q, k, v, mask)
    out = flash_row_attention(q, k, v, mask, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_batched_forward_with_flash_matches_xla():
    """Batched (leading-dim) forward — the ensemble path's shape — must
    dispatch to flash and match the XLA path, including per-member masks."""
    import dataclasses

    from npe_pfn_tpu.models import TabICAConfig, TabICAModel, transformer

    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    e, n, qn = 3, 40, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x_ctx = jax.random.normal(ks[0], (e, n, 8))
    y_ctx = jax.random.normal(ks[1], (e, n))
    x_qry = jax.random.normal(ks[2], (e, qn, 8))
    ctx_mask = jnp.arange(n)[None, :] < jnp.array([33, 40, 21])[:, None]
    ref = transformer.forward(cfg, model.params, x_ctx, y_ctx, x_qry, ctx_mask=ctx_mask)
    cfg_flash = dataclasses.replace(cfg, flash="on", flash_interpret=True)
    out = transformer.forward(
        cfg_flash, model.params, x_ctx, y_ctx, x_qry, ctx_mask=ctx_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_vmapped_encode_decode_with_flash_matches_xla():
    """The ensemble kernels vmap fit_encode/predict_logits; the pallas
    batching rule must lift the kernel correctly."""
    import dataclasses

    from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor

    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    model_flash = TabICAModel(
        cfg=dataclasses.replace(cfg, flash="on", flash_interpret=True),
        params=model.params, borders=model.borders,
    )
    e, n, qn = 3, 40, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x_ctx = jax.random.normal(ks[0], (e, n, 8))
    y_ctx = jax.random.normal(ks[1], (e, n))
    x_qry = jax.random.normal(ks[2], (qn, 8))
    ctx_mask = jnp.arange(n)[None, :] < jnp.array([33, 40, 21])[:, None]

    def member_logits(m):
        def f(xc, yc, cm):
            fitted = regressor.fit_encode(m, xc, yc, None, cm)
            return regressor.predict_logits(m, fitted, x_qry)
        return jax.vmap(f)(x_ctx, y_ctx, ctx_mask)

    ref = member_logits(model)
    out = member_logits(model_flash)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
