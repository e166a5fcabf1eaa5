"""Pallas TPU flash attention for TabICA's row axis.

The row-axis attention is the framework's hot op: every autoregressive
dimension attends Q query rows (observations × samples, up to ~10⁴) and N
context rows against N context rows, independently for each of T=F+1 column
tokens. The XLA path materializes [T, H, Lq, N] logits in HBM — fine for
N ≤ ~2k, prohibitive at the reference's 10k-row context ceiling
(docs/sample_batched_implementation.md:245). This kernel computes softmax
online in VMEM (flash-attention style), so memory is O(Bq·Bk) per program
and the context ceiling is lifted to HBM capacity.

Layout notes (see /opt/skills/guides/pallas_guide.md):
- grid = (B·H, Lq/Bq, Lk/Bk) with the key axis innermost; running max/sum
  and the output accumulator live in VMEM scratch that persists across the
  innermost grid dimension; output is written at the last key block.
- head_dim (32) is below the 128-lane width; scores [Bq, Bk] dominate the
  MXU work and are fully aligned. K/V tiles stream through VMEM.
- the context-row mask rides a [1, Bk] block and lands as -inf before the
  online max update, preserving exact padded-row semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # [1, Bq, hd]
    k_ref,  # [1, Bk, hd]
    v_ref,  # [1, Bk, hd]
    mask_ref,  # [1, Bk] (shared) or [1, 1, Bk] (per-batch) f32; 1.0 = real row
    out_ref,  # [1, Bq, hd]
    *refs,  # with_lse: (lse_ref [1, Bq, hd], m, l, acc); else (m, l, acc)
    scale: float,
    num_k_blocks: int,
    mask_3d: bool,
    with_lse: bool,
):
    if with_lse:
        lse_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        m_scratch, l_scratch, acc_scratch = refs
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [Bq, hd]
    k = k_ref[0]  # [Bk, hd]
    v = v_ref[0]  # [Bk, hd]
    mask = mask_ref[0, 0, :] if mask_3d else mask_ref[0, :]  # [Bk]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, Bk]
    s = s + (1.0 - mask)[None, :] * _NEG_INF

    m_prev = m_scratch[:, :1]  # [Bq, 1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [Bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # rescale of old accumulator
    p = jnp.exp(s - m_new)  # [Bq, Bk]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, hd]
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:, :1] = m_new
    l_scratch[:, :1] = l_new

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        l_fin = jnp.maximum(l_scratch[:, :1], 1e-30)
        out_ref[0] = (acc_scratch[:] / l_fin).astype(out_ref.dtype)
        if with_lse:
            # lse rides an [1, Bq, hd] block (lane-broadcast): a [1, Bq]
            # block violates Mosaic's (8, 128) tiling rule on real TPUs —
            # caught on hardware in round 3; interpret mode doesn't
            # enforce tiling.
            lse_ref[0] = jnp.broadcast_to(
                m_scratch[:, :1] + jnp.log(l_fin), lse_ref.shape[1:]
            ).astype(lse_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_row_attention(
    q: jnp.ndarray,  # [B, Lq, H, hd]
    k: jnp.ndarray,  # [B, Lk, H, hd]
    v: jnp.ndarray,  # [B, Lk, H, hd]
    kv_mask: jnp.ndarray,  # [Lk] shared or [B, Lk] per-batch row validity
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q·kᵀ + mask)·v with online softmax; returns [B, Lq, H, hd].

    B is the flattened (column-token × any outer batch, e.g. ensemble
    members) batch; H heads ride the grid. Lq and Lk are padded up to block
    multiples internally. ``kv_mask`` may be shared across the batch ([Lk])
    or per-batch-row ([B, Lk], e.g. different ensemble-member contexts).
    Also composes with jax.vmap (the batching rule lifts extra axes into the
    grid), so vmapped ensemble/sp paths dispatch here too.
    """
    return _flash_fwd(q, k, v, kv_mask, block_q, block_k, interpret,
                      with_lse=False)


def _flash_fwd(q, k, v, kv_mask, block_q, block_k, interpret, with_lse):
    """Shared pallas_call driver for both forward variants.

    ``with_lse=False``: returns out [B, Lq, H, hd] (inference path).
    ``with_lse=True``: returns (out, lse [B, H, Lq]) — the trainable
    forward, whose custom VJP consumes the per-query logsumexp.
    """
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    scale = hd**-0.5

    block_q = min(block_q, _round_up(lq, 8))
    block_k = min(block_k, _round_up(lk, 8))
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    mask_f, mask_spec, mask_3d = _mask_operand(kv_mask, h, lk, lk_p, block_k)

    # Fold (batch, heads) into one leading grid dim so every block is
    # [1, rows, hd] — rows divisible by 8, hd equal to the full trailing
    # dim, satisfying the Mosaic block-shape tiling rule.
    qf = jnp.swapaxes(q, 1, 2).reshape(b * h, lq_p, hd)
    kf = jnp.swapaxes(k, 1, 2).reshape(b * h, lk_p, hd)
    vf = jnp.swapaxes(v, 1, 2).reshape(b * h, lk_p, hd)

    num_k_blocks = lk_p // block_k
    grid = (b * h, lq_p // block_q, num_k_blocks)

    kernel = functools.partial(
        _flash_kernel, scale=scale, num_k_blocks=num_k_blocks,
        mask_3d=mask_3d, with_lse=with_lse,
    )
    qblock = pl.BlockSpec(
        (1, block_q, hd), lambda i, iq, ik: (i, iq, 0),
        memory_space=pltpu.VMEM,
    )
    kblock = pl.BlockSpec(
        (1, block_k, hd), lambda i, iq, ik: (i, ik, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b * h, lq_p, hd), q.dtype)
    if with_lse:
        out_specs = [qblock, qblock]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct((b * h, lq_p, hd), jnp.float32)]
    else:
        out_specs = qblock
        out_shapes = out_shape
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qblock, kblock, kblock, mask_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, mask_f)
    out = res[0] if with_lse else res
    out = jnp.swapaxes(out.reshape(b, h, lq_p, hd), 1, 2)[:, :lq]
    out = out * _any_valid_gate(kv_mask, out.dtype)
    if not with_lse:
        return out
    lse = res[1][..., 0].reshape(b, h, lq_p)[:, :, :lq]
    return out, lse


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _mask_operand(kv_mask, h: int, lk: int, lk_p: int, block_k: int):
    """Build the kernel's mask operand, its BlockSpec, and a static rank
    flag for the kernel.

    Shared mask ([Lk]): the hardware-proven 2-D layout — [1, Lk_p] with a
    (1, Bk) block, legal because the sublane block dim (1) equals the full
    array dim (round-3 flash benches ran exactly this). Per-batch mask
    ([B, Lk], B > 1): the same 2-D layout would violate Mosaic's
    block-shape tiling rule (block sublane dim 1 vs array dim B — the same
    class of crash the lse output hit on real TPUs in round 3; interpret
    mode doesn't check tiling), so it rides as [B, 1, Lk_p] with a
    (1, 1, Bk) block — the block's last-two dims are (1, Bk) with the
    sublane dim equal to the FULL middle dim (1), legal for any B."""
    if kv_mask.ndim == 1:
        mask_f = jnp.pad(kv_mask.astype(jnp.float32), (0, lk_p - lk))[None, :]
        spec = pl.BlockSpec(
            (1, block_k), lambda i, iq, ik: (0, ik), memory_space=pltpu.VMEM
        )
        return mask_f, spec, False
    mask_f = jnp.pad(kv_mask.astype(jnp.float32), ((0, 0), (0, lk_p - lk)))
    mask_f = mask_f[:, None, :]
    spec = pl.BlockSpec(
        (1, 1, block_k),
        lambda i, iq, ik: (i // h, 0, ik),
        memory_space=pltpu.VMEM,
    )
    return mask_f, spec, True


def _any_valid_gate(kv_mask, dtype):
    """0/1 gate per batch row for the degenerate all-keys-masked case.

    With every key masked, the in-kernel softmax reduces over the raw scores
    shifted by -1e30 and returns the *mean of masked V rows* instead of
    zeros (and the saved lse makes the backward leak O(1) gradients through
    masked keys). Gating forward output and the incoming cotangent on
    "any key valid" restores 0 output / 0 gradient for empty contexts.
    Shape: scalar for a shared [Lk] mask, [B,1,1,1] for per-batch [B, Lk].
    """
    valid = (jnp.sum(kv_mask.astype(jnp.float32), axis=-1) > 0).astype(dtype)
    if kv_mask.ndim == 1:
        return valid
    return valid[:, None, None, None]


# ---------------------------------------------------------------------------
# Trainable flash attention (custom VJP)
#
# The Pallas forward has no autodiff rule, so long-context *training* needs
# an explicit VJP. Forward: the same online-softmax kernel (one kernel, the
# static ``with_lse`` flag adds the logsumexp output — one [B·H, Lq] f32
# vector, negligible). Backward: the standard flash recomputation,
# expressed as a lax.scan over key blocks in plain XLA — memory O(Lq·Bk)
# instead of O(Lq·Lk), MXU-bound matmuls, no second Pallas kernel to
# maintain.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_fwd_lse(q, k, v, kv_mask, block_q=256, block_k=1024, interpret=False):
    """Like flash_row_attention but also returns lse [B, H, Lq]."""
    return _flash_fwd(q, k, v, kv_mask, block_q, block_k, interpret,
                      with_lse=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_row_attention_trainable(
    q, k, v, kv_mask, block_q: int = 256, block_k: int = 1024,
    interpret: bool = False,
):
    """Differentiable flash attention: Pallas forward, chunked-XLA backward.
    Same contract as flash_row_attention; safe under jax.grad / remat, so
    long-context pretraining can dispatch to it (cfg.flash='auto').

    The undifferentiated primal routes to the plain forward kernel — the
    lse side-output is only materialized under jax.grad (_trainable_fwd),
    so inference through the 'auto'/'on' dispatch pays nothing extra."""
    return flash_row_attention(q, k, v, kv_mask, block_q, block_k, interpret)


def _trainable_fwd(q, k, v, kv_mask, block_q, block_k, interpret):
    out, lse = _flash_fwd_lse(q, k, v, kv_mask, block_q, block_k, interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _trainable_bwd(block_q, block_k, interpret, res, d_out):
    q, k, v, kv_mask, out, lse = res
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    scale = hd**-0.5
    f32 = jnp.float32
    qh = jnp.swapaxes(q, 1, 2).astype(f32)  # [B, H, Lq, hd]
    doh = jnp.swapaxes(d_out, 1, 2).astype(f32)
    outh = jnp.swapaxes(out, 1, 2).astype(f32)

    lk_p = _round_up(lk, block_k)
    pad = lk_p - lk
    mask2 = kv_mask if kv_mask.ndim == 2 else jnp.broadcast_to(
        kv_mask[None, :], (b, lk)
    )
    mask2 = jnp.pad(mask2.astype(f32), ((0, 0), (0, pad)))
    # Empty-context rows: zero the incoming cotangent so dv/dp/ds/dq all
    # vanish for batch rows with no valid key (see _any_valid_gate).
    doh = doh * (jnp.sum(mask2, axis=-1) > 0).astype(f32)[:, None, None, None]
    delta = jnp.sum(doh * outh, axis=-1)
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(f32)
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(f32)
    nkb = lk_p // block_k
    k_blocks = jnp.swapaxes(kp, 1, 2).reshape(b, h, nkb, block_k, hd)
    k_blocks = jnp.moveaxis(k_blocks, 2, 0)  # [nkb, B, H, Bk, hd]
    v_blocks = jnp.moveaxis(
        jnp.swapaxes(vp, 1, 2).reshape(b, h, nkb, block_k, hd), 2, 0
    )
    m_blocks = jnp.moveaxis(mask2.reshape(b, nkb, block_k), 1, 0)  # [nkb, B, Bk]

    def block_step(dq_acc, blk):
        kb, vb, mb = blk  # [B,H,Bk,hd], [B,H,Bk,hd], [B,Bk]
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kb) * scale
        s = s + (1.0 - mb)[:, None, None, :] * _NEG_INF
        p = jnp.exp(s - lse[..., None])  # [B,H,Lq,Bk]
        dv = jnp.einsum("bhqk,bhqd->bhkd", p, doh)
        dp = jnp.einsum("bhqd,bhkd->bhqk", doh, vb)
        ds = p * (dp - delta[..., None]) * scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, kb)
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qh)
        return dq_acc, (dk, dv)

    dq0 = jnp.zeros_like(qh)
    dq, (dk_b, dv_b) = jax.lax.scan(block_step, dq0, (k_blocks, v_blocks, m_blocks))
    dk = jnp.moveaxis(dk_b, 0, 2).reshape(b, h, lk_p, hd)[:, :, :lk]
    dv = jnp.moveaxis(dv_b, 0, 2).reshape(b, h, lk_p, hd)[:, :, :lk]
    d_mask = jnp.zeros(kv_mask.shape, f32)
    if jnp.issubdtype(kv_mask.dtype, jnp.bool_) or jnp.issubdtype(
        kv_mask.dtype, jnp.integer
    ):
        import numpy as _np

        d_mask = _np.zeros(kv_mask.shape, jax.dtypes.float0)
    return (
        jnp.swapaxes(dq, 1, 2).astype(q.dtype),
        jnp.swapaxes(dk, 1, 2).astype(k.dtype),
        jnp.swapaxes(dv, 1, 2).astype(v.dtype),
        d_mask,
    )


flash_row_attention_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def reference_row_attention(q, k, v, kv_mask):
    """Pure-jnp reference for kernel parity tests. kv_mask [Lk] or [B, Lk]."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    m = kv_mask[None, :] if kv_mask.ndim == 1 else kv_mask
    s = jnp.where(m[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
