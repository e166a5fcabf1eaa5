"""Sequence-parallel (context-sharded) TabICA forward.

The reference's context ceiling (~10K rows, filtering as the only
workaround — SURVEY §5 long-context) is a single-device memory limit. This
module shards the CONTEXT ROW axis over a mesh axis ("sp"): every device
holds N/n_sp context rows, feature-attention and MLP are row-local, and the
row-axis attention all-gathers each layer's K/V over ICI just-in-time (one
layer's K/V lives gathered at a time, so peak memory drops from O(L·N) to
O(L·N/n_sp + N)). Combined with query-row data parallelism ("data") this is
the dp×sp mesh in __graft_entry__.dryrun_multichip.

All math is identical to the single-device path (tests assert exact
equality): attention against the gathered K/V in row order, masks included.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import regressor
from ..models.regressor import FittedContext, TabICAModel
from ..models.transformer import (
    _NEG_INF,
    _attn_core,
    _embed_ctx,
    _embed_qry,
    _feat_attn_step,
    _head,
    _ln,
    _mlp_step,
    _project_kv,
    _res_add,
)


def _gathered_row_attn(cfg, p, q_local, k_local, v_local, mask_local, axis):
    """Row attention where K/V/mask are sharded over `axis` (row dim) and the
    queries are local rows: all-gather K/V just-in-time."""
    k_all = jax.lax.all_gather(k_local, axis, axis=-3, tiled=True)
    v_all = jax.lax.all_gather(v_local, axis, axis=-3, tiled=True)
    mask_all = jax.lax.all_gather(mask_local, axis, axis=-1, tiled=True)
    return _attn_core(cfg, p, q_local, k_all, v_all, mask_all[..., None, :])


def _ring_row_attn(cfg, p, q_in, k_local, v_local, mask_local, axis, n_sp):
    """Row attention with ring-rotated K/V shards — no full gather.

    Each of the n_sp steps attends the local queries against ONE context
    shard with flash-style online-softmax accumulation, then `ppermute`s the
    K/V/mask shard one hop along the ring. Peak memory is O(N/n_sp) per
    layer (vs O(N) for the gather), and on hardware each hop's transfer
    overlaps the next shard's matmul — the standard Ring Attention schedule
    on an ICI ring. Numerics match the gathered softmax up to the usual
    online-softmax reassociation (~1e-6 in f32; tests assert allclose).
    """
    dt = jnp.dtype(cfg.dtype)
    scale = cfg.head_dim**-0.5
    q = jnp.einsum("...ld,dhk->...lhk", q_in.astype(dt), p["wq"].astype(dt))
    lead = q.shape[:-3]
    lq, h, hd = q.shape[-3], q.shape[-2], q.shape[-1]
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]

    def step(carry, _):
        k_c, v_c, mk_c, m, l, acc = carry
        logits = jnp.einsum(
            "...qhd,...khd->...hqk", q, k_c, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mk_c[..., None, None, :], logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        pexp = jnp.exp(logits - m_new)
        l_new = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "...hqk,...khd->...qhd", pexp.astype(dt), v_c,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * jnp.swapaxes(alpha, -3, -2) + pv
        k_n = jax.lax.ppermute(k_c, axis, perm)
        v_n = jax.lax.ppermute(v_c, axis, perm)
        mk_n = jax.lax.ppermute(mk_c, axis, perm)
        return (k_n, v_n, mk_n, m_new, l_new, acc_new), None

    m0 = jnp.full(lead + (h, lq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros(lead + (h, lq, 1), jnp.float32)
    acc0 = jnp.zeros(lead + (lq, h, hd), jnp.float32)
    carry0 = (k_local, v_local, mask_local, m0, l0, acc0)
    (_, _, _, _, l, acc), _ = jax.lax.scan(step, carry0, None, length=n_sp)
    out = (acc / jnp.maximum(jnp.swapaxes(l, -3, -2), 1e-30)).astype(dt)
    out = jnp.einsum(
        "...qhd,hdm->...qm", out, p["wo"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out + p["bo"]


def _sharded_row_attn(cfg, p, q_local, k_l, v_l, mask_l, axis, n_sp, mode):
    if mode == "ring":
        return _ring_row_attn(cfg, p, q_local, k_l, v_l, mask_l, axis, n_sp)
    return _gathered_row_attn(cfg, p, q_local, k_l, v_l, mask_l, axis)


def _block_ctx_sp(cfg, p, h_ctx, token_mask, ctx_mask_local, axis, n_sp, mode):
    """_block_ctx with rows sharded: identical math, gathered or ring K/V."""
    h_ctx = _feat_attn_step(cfg, p, h_ctx, token_mask)
    hc = jnp.swapaxes(h_ctx, -3, -2)  # [T, n_local, D]
    hc_n = _ln(p["ln_row"], hc).astype(jnp.dtype(cfg.dtype))
    k_l, v_l = _project_kv(cfg, p["row_attn"], hc_n)
    hc = _res_add(
        cfg, hc,
        _sharded_row_attn(cfg, p["row_attn"], hc_n, k_l, v_l, ctx_mask_local,
                          axis, n_sp, mode),
    )
    h_ctx = jnp.swapaxes(hc, -3, -2)
    return _mlp_step(cfg, p, h_ctx), (k_l, v_l)


def sp_fit_encode(
    mesh: Mesh,
    model: TabICAModel,
    x_ctx: jnp.ndarray,  # [N, F] raw — N divisible by the sp axis size
    y_ctx: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
    axis: str = "sp",
    row_attn: str = "gather",
) -> FittedContext:
    """Context-sharded fit_encode: returns a FittedContext whose K/V cache
    stays sharded over the mesh's sp axis (rows dim).

    ``row_attn``: "gather" all-gathers each layer's K/V just-in-time
    (peak O(N) per layer); "ring" keeps K/V sharded and rotates shards via
    ppermute (peak O(N/n_sp) — for contexts past a slice's HBM)."""
    n, f = x_ctx.shape
    n_sp = mesh.shape[axis]
    assert n % n_sp == 0, f"context rows {n} must divide sp axis {n_sp}"
    if feat_mask is None:
        feat_mask = jnp.ones((f,), bool)
    if ctx_mask is None:
        ctx_mask = jnp.ones((n,), bool)
    stats = regressor.compute_stats(x_ctx, y_ctx, ctx_mask)
    xn = regressor.normalize_x(stats, x_ctx) * feat_mask[None, :]
    yn = regressor.normalize_y(stats, y_ctx) * ctx_mask
    token_mask = jnp.concatenate([feat_mask, jnp.ones((1,), bool)])

    cfg, params = model.cfg, model.params

    def enc(params, xn_l, yn_l, ctx_mask_l):
        h = _embed_ctx(cfg, params["embed"], xn_l, yn_l, feat_mask)

        def body(hc, p):
            hc, kv = _block_ctx_sp(
                cfg, p, hc, token_mask, ctx_mask_l, axis, n_sp, row_attn
            )
            return hc, kv

        _, cache = jax.lax.scan(body, h, params["blocks"])
        return cache

    cache = jax.jit(
        jax.shard_map(
            enc,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(None, None, axis), P(None, None, axis)),
            check_vma=False,
        )
    )(params, xn, yn, ctx_mask)
    return FittedContext(cache=cache, stats=stats, feat_mask=feat_mask, ctx_mask=ctx_mask)


def sp_decode(
    mesh: Mesh,
    model: TabICAModel,
    fitted: FittedContext,
    x_qry: jnp.ndarray,  # [Q, F] raw — Q divisible by the data axis (if present)
    axis: str = "sp",
    data_axis: Optional[str] = "data",
    row_attn: str = "gather",
) -> jnp.ndarray:
    """Decode queries against the sp-sharded cache: queries ride the data
    axis (if the mesh has one), K/V gathers (or ring hops) ride the sp axis."""
    cfg, params = model.cfg, model.params
    n_sp = mesh.shape[axis]
    xq = regressor.normalize_x(fitted.stats, x_qry) * fitted.feat_mask[None, :]
    token_mask = jnp.concatenate(
        [fitted.feat_mask, jnp.ones((1,), bool)]
    )
    have_data = data_axis is not None and data_axis in mesh.shape

    def dec(params, cache, xq_l, ctx_mask_l):
        h = _embed_qry(cfg, params["embed"], xq_l, fitted.feat_mask)

        def body(hq, layer):
            p, (k_l, v_l) = layer
            hq = _feat_attn_step(cfg, p, hq, token_mask)
            hqs = jnp.swapaxes(hq, -3, -2)
            hq_n = _ln(p["ln_row"], hqs).astype(jnp.dtype(cfg.dtype))
            hqs = _res_add(
                cfg, hqs,
                _sharded_row_attn(cfg, p["row_attn"], hq_n, k_l, v_l,
                                  ctx_mask_l, axis, n_sp, row_attn),
            )
            hq = jnp.swapaxes(hqs, -3, -2)
            return _mlp_step(cfg, p, hq), None

        hq, _ = jax.lax.scan(body, h, (params["blocks"], cache))
        return _head(cfg, params["head"], hq)

    q_spec = P(data_axis) if have_data else P()
    out = jax.jit(
        jax.shard_map(
            dec,
            mesh=mesh,
            in_specs=(P(), (P(None, None, axis), P(None, None, axis)), q_spec, P(axis)),
            out_specs=q_spec,
            check_vma=False,
        )
    )(params, fitted.cache, xq, fitted.ctx_mask)
    return out
