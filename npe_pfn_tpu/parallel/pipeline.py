"""Pipeline-parallel (GPipe-style) TabICA forward over the layer axis.

Completes the mesh-parallelism family (dp: mesh.py, sp/ring:
context_sharded.py, tp: tensor_parallel.py — the reference has none of
these, SURVEY §2.5). Pipeline parallelism shards the *stacked layer axis*
of the params pytree over a "pp" mesh axis: stage s owns layers
[s·L/n_pp, (s+1)·L/n_pp) and the slice of the context K/V cache those
layers produced. Activations hop stage→stage over ICI via ``ppermute``.

Why this shape fits the model: the forward is already a ``lax.scan`` over
layer-stacked params (transformer.py init_params), so a stage is just the
same scan over a leading-axis shard — no per-layer surgery.

Schedule:
- ``pp_fit_encode``: context rows can't be microbatched (row attention is
  all-to-all over rows), so the encode is a pure sequential pipeline fill:
  n_pp ticks, stage s processes at tick s and keeps its local K/V shard
  resident. Encode cost amortizes over the many decode calls that reuse
  the cache (the sampler's per-dimension pattern).
- ``pp_decode``: query rows are independent, so they stream through as M
  microbatches with the classic GPipe overlap — M + n_pp − 1 ticks, bubble
  fraction (n_pp−1)/(M+n_pp−1). Branchless under jit: every stage computes
  every tick and validity masks select what is kept.

All math is identical to the single-device path (exact-equality tests).
Use when the layer stack (or its K/V cache at very long contexts) outgrows
one chip and tp/sp axes are already saturated.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import regressor
from ..models.regressor import FittedContext, TabICAModel
from ..models.transformer import (
    _block_ctx,
    _block_qry,
    _embed_ctx,
    _embed_qry,
    _head,
)


def _place(mesh: Mesh, spec: P, tree):
    """Commit a pytree to this mesh before the shard_map jit: inputs may
    arrive committed to a different device set (e.g. params replicated over
    a larger dp mesh), which jit would reject as incompatible."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), tree
    )


def _shift_next(h, axis, n_pp):
    """Send h to the next pipeline stage (stage s -> s+1); the first stage
    receives zeros (it re-injects fresh input instead)."""
    return jax.lax.ppermute(h, axis, [(i, i + 1) for i in range(n_pp - 1)])


def pp_fit_encode(
    mesh: Mesh,
    model: TabICAModel,
    x_ctx: jnp.ndarray,  # [N, F] raw
    y_ctx: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
    axis: str = "pp",
) -> FittedContext:
    """Encode the context through a layer-sharded pipeline; the returned
    FittedContext's K/V cache stays sharded over ``axis`` (layer dim), ready
    for ``pp_decode``."""
    n, f = x_ctx.shape
    n_pp = mesh.shape[axis]
    cfg, params = model.cfg, model.params
    assert cfg.num_layers % n_pp == 0, (
        f"num_layers {cfg.num_layers} must divide pp axis {n_pp}"
    )
    if feat_mask is None:
        feat_mask = jnp.ones((f,), bool)
    if ctx_mask is None:
        ctx_mask = jnp.ones((n,), bool)
    stats = regressor.compute_stats(x_ctx, y_ctx, ctx_mask)
    xn = regressor.normalize_x(stats, x_ctx) * feat_mask[None, :]
    yn = regressor.normalize_y(stats, y_ctx) * ctx_mask
    token_mask = jnp.concatenate([feat_mask, jnp.ones((1,), bool)])

    def enc(blocks_local, embed_p, xn_, yn_, ctx_mask_):
        stage = jax.lax.axis_index(axis)
        h0 = _embed_ctx(cfg, embed_p, xn_, yn_, feat_mask)

        def local_layers(h):
            def body(hc, p):
                hc, kv = _block_ctx(cfg, p, hc, token_mask, ctx_mask_)
                return hc, kv

            return jax.lax.scan(body, h, blocks_local)

        def tick(carry, t):
            h_cur, kv_acc = carry
            h_proc, kv_new = local_layers(h_cur)
            keep = t == stage
            kv_acc = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, b, a), kv_acc, kv_new
            )
            h_recv = _shift_next(h_proc, axis, n_pp)
            # Stage 0 never consumes received activations (it holds the
            # pipeline's input); everyone else carries what stage-1 sent.
            h_cur = jnp.where(stage == 0, h_cur, h_recv)
            return (h_cur, kv_acc), None

        _, kv0 = local_layers(h0)  # shape/dtype template only
        kv0 = jax.tree_util.tree_map(jnp.zeros_like, kv0)
        (_, kv_acc), _ = jax.lax.scan(
            tick, (h0, kv0), jnp.arange(n_pp)
        )
        return kv_acc

    cache = jax.jit(
        jax.shard_map(
            enc,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )(
        _place(mesh, P(axis), params["blocks"]),
        _place(mesh, P(), params["embed"]),
        _place(mesh, P(), xn),
        _place(mesh, P(), yn),
        _place(mesh, P(), ctx_mask),
    )
    return FittedContext(
        cache=cache, stats=stats, feat_mask=feat_mask, ctx_mask=ctx_mask
    )


def pp_decode(
    mesh: Mesh,
    model: TabICAModel,
    fitted: FittedContext,
    x_qry: jnp.ndarray,  # [Q, F] raw — Q divisible by num_microbatches
    num_microbatches: int = 4,
    axis: str = "pp",
) -> jnp.ndarray:
    """GPipe decode: query microbatches stream through the layer-sharded
    pipeline; returns bar logits [Q, num_bars] (replicated)."""
    cfg, params = model.cfg, model.params
    n_pp = mesh.shape[axis]
    m = num_microbatches
    q, f = x_qry.shape
    assert q % m == 0, f"query rows {q} must divide microbatches {m}"
    xq = regressor.normalize_x(fitted.stats, x_qry) * fitted.feat_mask[None, :]
    xq_mb = xq.reshape(m, q // m, f)
    token_mask = jnp.concatenate([fitted.feat_mask, jnp.ones((1,), bool)])

    def dec(blocks_local, embed_p, head_p, cache_local, xq_mb_, ctx_mask_):
        stage = jax.lax.axis_index(axis)

        def local_layers(h):
            def body(hq, layer):
                p, kv = layer
                return _block_qry(cfg, p, hq, kv, token_mask, ctx_mask_), None

            h, _ = jax.lax.scan(body, h, (blocks_local, cache_local))
            return h

        def tick(carry, t):
            h_cur, out_acc = carry
            # Stage 0 injects microbatch t (clipped; invalid ticks masked
            # downstream by the write guard on the last stage).
            mb_in = jax.lax.dynamic_index_in_dim(
                xq_mb_, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
            )
            h_in = jnp.where(
                stage == 0, _embed_qry(cfg, embed_p, mb_in, fitted.feat_mask), h_cur
            )
            h_proc = local_layers(h_in)
            logits = _head(cfg, head_p, h_proc)
            mb_out = t - (n_pp - 1)
            valid = (stage == n_pp - 1) & (mb_out >= 0) & (mb_out < m)
            written = jax.lax.dynamic_update_index_in_dim(
                out_acc, logits, jnp.clip(mb_out, 0, m - 1), axis=0
            )
            out_acc = jnp.where(valid, written, out_acc)
            h_cur = _shift_next(h_proc, axis, n_pp)
            return (h_cur, out_acc), None

        h0 = jnp.zeros(
            (q // m, f + 1, cfg.d_model), jnp.dtype(cfg.dtype)
        )
        out0 = jnp.zeros((m, q // m, cfg.num_bars), jnp.float32)
        (_, out_acc), _ = jax.lax.scan(
            tick, (h0, out0), jnp.arange(m + n_pp - 1)
        )
        # Only the last stage holds real outputs; psum replicates them.
        out_acc = jnp.where(stage == n_pp - 1, out_acc, 0.0)
        return jax.lax.psum(out_acc, axis)

    out = jax.jit(
        jax.shard_map(
            dec,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), (P(axis), P(axis)), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(
        _place(mesh, P(axis), params["blocks"]),
        _place(mesh, P(), params["embed"]),
        _place(mesh, P(), params["head"]),
        _place(mesh, P(axis), fitted.cache),
        _place(mesh, P(), xq_mb),
        _place(mesh, P(), fitted.ctx_mask),
    )
    return out.reshape(q, cfg.num_bars)
