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


def test_flash_empty_context_zero_output_and_grad():
    """A batch row whose keys are ALL masked must return zeros forward and
    propagate zero gradients (advisor finding, round 2: without the gate the
    kernel returned the mean of masked V rows and the VJP leaked O(1)
    gradients through masked keys)."""
    from npe_pfn_tpu.ops.flash_attention import flash_row_attention_trainable

    b, h, hd, lq, lk = 2, 1, 32, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    # batch row 0: valid keys; batch row 1: empty context
    mask = jnp.stack([jnp.arange(lk) < 32, jnp.zeros(lk, bool)])

    out = flash_row_attention(q, k, v, mask, block_q=16, block_k=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    assert np.all(np.isfinite(np.asarray(out[0])))

    def loss(q, k, v):
        o = flash_row_attention_trainable(q, k, v, mask, 16, 32, True)
        return jnp.sum(o**2)

    o_t = flash_row_attention_trainable(q, k, v, mask, 16, 32, True)
    np.testing.assert_array_equal(np.asarray(o_t[1]), 0.0)
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_array_equal(np.asarray(dq[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(dk[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(dv[1]), 0.0)
    assert float(jnp.abs(dq[0]).sum()) > 0  # valid row still gets gradients


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


def test_trainable_flash_grad_matches_reference():
    """custom-VJP flash: value AND gradients (q, k, v) match autodiff
    through the pure-jnp reference, including masked/padded key rows."""
    from npe_pfn_tpu.ops.flash_attention import flash_row_attention_trainable

    b, h, hd, lq, lk = 2, 2, 32, 48, 160
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    cot = jax.random.normal(ks[3], (b, lq, h, hd), jnp.float32)
    mask = jnp.arange(lk) < (lk - 13)

    def loss_flash(q, k, v):
        out = flash_row_attention_trainable(
            q, k, v, mask, 32, 64, True  # interpret mode on CPU
        )
        return jnp.sum(out * cot)

    def loss_ref(q, k, v):
        return jnp.sum(reference_row_attention(q, k, v, mask) * cot)

    val_f, grads_f = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-4)
    for gf, gr, name in zip(grads_f, grads_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_trainable_flash_grad_per_batch_mask_and_vmap():
    from npe_pfn_tpu.ops.flash_attention import flash_row_attention_trainable

    b, h, hd, lq, lk = 3, 2, 32, 32, 96
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    mask2 = jnp.stack([jnp.arange(lk) < m for m in (96, 40, 7)])

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_row_attention_trainable(q, k, v, mask2, 32, 32, True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(reference_row_attention(q, k, v, mask2) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_training_step_through_flash_path():
    """End-to-end: batch_loss gradient with cfg.flash='on' (interpret) is
    finite and close to the XLA-attention gradient — the long-context
    pretraining path is differentiable."""
    from npe_pfn_tpu.models import TabICAConfig, TabICAModel, transformer
    from npe_pfn_tpu.models import bar_distribution as bar

    def loss_for(cfg, model, data):
        x_ctx, y_ctx, x_qry, y_qry, fm, cm = data

        def f(params):
            logits = transformer.forward(
                cfg, params, x_ctx, y_ctx, x_qry, fm, cm, remat=True
            )
            return jnp.mean(bar.nll(model.borders, logits, y_qry))

        return f

    cfg_x = TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=8,
                         num_bars=16, dtype="float32", flash="off")
    cfg_f = TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=8,
                         num_bars=16, dtype="float32", flash="on",
                         flash_interpret=True)
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg_x)
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    data = (
        jax.random.normal(ks[0], (40, 8)),
        jax.random.normal(ks[1], (40,)),
        jax.random.normal(ks[2], (16, 8)),
        jax.random.normal(ks[3], (16,)),
        jnp.ones((8,), bool),
        jnp.arange(40) < 36,
    )
    from jax.flatten_util import ravel_pytree

    gx = jax.grad(lambda p: loss_for(cfg_x, model, data)(p))(model.params)
    gg = jax.grad(lambda p: loss_for(cfg_f, model, data)(p))(model.params)
    flat_x, _ = ravel_pytree(gx)
    flat_f, _ = ravel_pytree(gg)
    assert np.all(np.isfinite(np.asarray(flat_f)))
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_x), rtol=5e-3, atol=5e-3
    )


def test_flash_wide_head_dim_128():
    """hd=128 — the v4 serving shape (d256/h2): two 128-wide heads dispatch
    through flash at the 2048-row context default. Interpret mode checks the
    kernel logic; the real-chip Mosaic-tiling smoke rides the round-4 probe
    (scripts/probe_checkpoint.py at --num_context 2048)."""
    from npe_pfn_tpu.ops.flash_attention import flash_row_attention_trainable

    b, h, hd, lq, lk = 2, 2, 128, 32, 96
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, lq, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, hd), jnp.float32)
    mask = jnp.arange(lk) < (lk - 5)
    ref = reference_row_attention(q, k, v, mask)
    out = flash_row_attention(q, k, v, mask, block_q=32, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    # Trainable variant: forward parity + finite grads at the wide head dim.
    def loss(q):
        return jnp.sum(
            flash_row_attention_trainable(q, k, v, mask, interpret=True) ** 2
        )
    g = jax.grad(loss)(q)
    assert bool(jnp.isfinite(g).all())
