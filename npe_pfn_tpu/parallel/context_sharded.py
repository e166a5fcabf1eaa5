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


def _block_ctx_sp(cfg, p, h_ctx, token_mask, ctx_mask_local, axis):
    """_block_ctx with rows sharded: identical math, gathered K/V."""
    h_ctx = _feat_attn_step(cfg, p, h_ctx, token_mask)
    hc = jnp.swapaxes(h_ctx, -3, -2)  # [T, n_local, D]
    hc_n = _ln(p["ln_row"], hc).astype(jnp.dtype(cfg.dtype))
    k_l, v_l = _project_kv(cfg, p["row_attn"], hc_n)
    hc = _res_add(
        cfg, hc, _gathered_row_attn(cfg, p["row_attn"], hc_n, k_l, v_l, ctx_mask_local, axis)
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
) -> FittedContext:
    """Context-sharded fit_encode: returns a FittedContext whose K/V cache
    stays sharded over the mesh's sp axis (rows dim)."""
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
            hc, kv = _block_ctx_sp(cfg, p, hc, token_mask, ctx_mask_l, axis)
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
) -> jnp.ndarray:
    """Decode queries against the sp-sharded cache: queries ride the data
    axis (if the mesh has one), K/V gathers ride the sp axis."""
    cfg, params = model.cfg, model.params
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
                _gathered_row_attn(cfg, p["row_attn"], hq_n, k_l, v_l, ctx_mask_l, axis),
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
