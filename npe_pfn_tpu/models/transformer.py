"""TabICA: two-axis in-context tabular transformer (pure-functional JAX).

TPU-native replacement for the external PyTorch TabPFNv2 transformer the
reference calls through ``TabPFNRegressor.fit/predict`` (reference:
npe_pfn.py:48, 140-146). Design (TabPFNv2 *scheme*, original implementation):

- every table cell is a token of width ``d_model``; a row is ``F`` feature
  cells plus one target cell;
- each block runs (a) attention across the feature axis within each row,
  (b) attention across the row axis within each column, (c) an MLP;
- rows are a *set*: no positional encoding on the row axis; context rows
  attend to context rows, query rows attend only to context rows (query rows
  are mutually independent — required so posterior samples for different
  query points cannot interact);
- column identity is structural (row attention is per-column), so the model
  is exactly permutation-invariant over feature columns — no feature-shuffle
  ensembling is needed, unlike TabPFN's preprocessing ensemble;
- the regression readout maps the query row's target-cell state to
  bar-distribution logits (see bar_distribution.py).

Why pure-functional instead of flax modules: the sampler needs an
encode/decode split (context states cached once per autoregressive dimension,
query rows streamed in chunks against that cache — the "context reuse across
dims" performance lever), per-layer remat for training, and scan-over-layers
for compile time. All three are trivial with an explicit params pytree.

Shapes are static everywhere: inactive feature columns and padded context
rows are masked, never sliced, so one compiled executable serves every step
of the autoregressive sampling scan.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import TabICAConfig

Params = Dict[str, Any]
_NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: TabICAConfig) -> Params:
    """GPT-2-style init; block params are stacked along a leading layer axis
    so the forward pass can ``lax.scan`` over layers."""
    d, h, hd, l = cfg.d_model, cfg.num_heads, cfg.head_dim, cfg.num_layers
    hid = d * cfg.mlp_ratio
    keys = iter(jax.random.split(rng, 32))
    nrm = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(jnp.float32)
    # Residual-output projections scaled down by sqrt(2 * num_sublayers).
    out_scale = 0.02 / math.sqrt(2.0 * 3 * l)

    def attn_params():
        return {
            "wq": nrm(next(keys), (l, d, h, hd)),
            "wk": nrm(next(keys), (l, d, h, hd)),
            "wv": nrm(next(keys), (l, d, h, hd)),
            "wo": nrm(next(keys), (l, h, hd, d), out_scale),
            "bo": jnp.zeros((l, d)),
        }

    ln = lambda: {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))}
    pool = {}
    if cfg.row_pool_slots:
        # Row-attention bottleneck (config.py row_pool_slots): K learned slot
        # queries per layer, a token→slot pooling cross-attention, and a
        # slot→token unpooling cross-attention. Scale-1 slot embeddings give
        # the K pooling queries distinct directions from step 0.
        pool = {
            "pool": {
                "slots": nrm(next(keys), (l, cfg.row_pool_slots, d), 1.0),
                "pool_attn": attn_params(),
                "ln_slot": ln(),
                "ln_unpool": ln(),
                "unpool_attn": attn_params(),
            }
        }
    params = {
        "embed": {
            "w_feat": nrm(next(keys), (d,), 1.0),
            "b_feat": jnp.zeros((d,)),
            "w_y": nrm(next(keys), (d,), 1.0),
            "b_y": jnp.zeros((d,)),
            "y_missing": nrm(next(keys), (d,), 1.0),
        },
        "blocks": {
            "ln_feat": ln(),
            "feat_attn": attn_params(),
            "ln_row": ln(),
            "row_attn": attn_params(),
            "ln_mlp": ln(),
            "mlp": (
                {
                    # Mixture-of-experts MLP (config.py num_experts): per-token
                    # linear router over E experts, each expert a full
                    # d->hid->d MLP. Stored expert-major so the "ep" mesh axis
                    # shards dim 1 (parallel/expert_parallel.py).
                    "router": nrm(next(keys), (l, d, cfg.num_experts)),
                    "w1": nrm(next(keys), (l, cfg.num_experts, d, hid)),
                    "b1": jnp.zeros((l, cfg.num_experts, hid)),
                    "w2": nrm(next(keys), (l, cfg.num_experts, hid, d), out_scale),
                    "b2": jnp.zeros((l, cfg.num_experts, d)),
                }
                if cfg.num_experts
                else {
                    "w1": nrm(next(keys), (l, d, hid)),
                    "b1": jnp.zeros((l, hid)),
                    "w2": nrm(next(keys), (l, hid, d), out_scale),
                    "b2": jnp.zeros((l, d)),
                }
            ),
            **pool,
        },
        "head": {
            "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "w1": nrm(next(keys), (d, 2 * d)),
            "b1": jnp.zeros((2 * d,)),
            "w2": nrm(next(keys), (2 * d, cfg.num_bars)),
            "b2": jnp.zeros((cfg.num_bars,)),
        },
    }
    return params


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _ln(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]


def _project_kv(cfg: TabICAConfig, p: Params, kv_in: jnp.ndarray):
    """K/V projections, separated so the context's K/V can be cached once
    per autoregressive dimension instead of recomputed per query chunk."""
    dt = jnp.dtype(cfg.dtype)
    k = jnp.einsum("...ld,dhk->...lhk", kv_in.astype(dt), p["wk"].astype(dt))
    v = jnp.einsum("...ld,dhk->...lhk", kv_in.astype(dt), p["wv"].astype(dt))
    return k, v


def _attn_core(
    cfg: TabICAConfig,
    p: Params,
    q_in: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Multi-head attention against precomputed K/V, batch-agnostic.

    q_in: [..., Lq, D]; k, v: [..., Lk, H, hd]; kv_mask broadcastable [..., Lk].
    """
    dt = jnp.dtype(cfg.dtype)
    # Score-tensor storage dtype: the [..., H, Lq, Lk] logits are the HBM
    # bottleneck of the train step (results/train_step_ab.json); bf16 halves
    # that traffic. The dot still accumulates in f32 and softmax upcasts to
    # f32 for the reductions — only the materialized tensor narrows.
    sdt = jnp.dtype(cfg.scores_dtype)
    scale = cfg.head_dim**-0.5
    q = jnp.einsum("...ld,dhk->...lhk", q_in.astype(dt), p["wq"].astype(dt))
    logits = (jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    ) * scale).astype(sdt)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[..., None, None, :], logits, _NEG_INF)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
    out = jnp.einsum(
        "...qhd,hdm->...qm", out, p["wo"].astype(dt), preferred_element_type=jnp.float32
    )
    return out + p["bo"]


def _attn(
    cfg: TabICAConfig,
    p: Params,
    q_in: jnp.ndarray,
    kv_in: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    k, v = _project_kv(cfg, p, kv_in)
    return _attn_core(cfg, p, q_in, k, v, kv_mask)


# Flash-attention dispatch for the row axis. "auto" uses the Pallas kernel
# on TPU once the context is long enough that materializing [T, H, Lq, N]
# logits hurts; "on"/"off" force it. The mode lives on TabICAConfig (a
# static jit argument), so switching it correctly retraces.
_FLASH_AUTO_MIN_KV = 2048


def _flash_applicable(cfg: TabICAConfig, q_in: jnp.ndarray, kv_len: int) -> bool:
    if cfg.flash == "off" or q_in.ndim < 3:
        return False
    if cfg.flash == "on":
        return True
    return jax.default_backend() == "tpu" and kv_len >= _FLASH_AUTO_MIN_KV


def _attn_core_flash(
    cfg: TabICAConfig,
    p: Params,
    q_in: jnp.ndarray,  # [..., T, Lq, D] — any leading batch dims
    k: jnp.ndarray,  # [..., T, Lk, H, hd]
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # [..., Lk] (leading dims = q_in's minus T)
) -> jnp.ndarray:
    """Flash dispatch with explicit flattening of leading batch dims (the
    ensemble and sp paths carry [E, T, ...]); per-batch masks become [B, Lk]
    rows for the kernel. vmapped calls route through the pallas batching
    rule instead and never reach the ndim > 3 branch."""
    from ..ops.flash_attention import flash_row_attention_trainable

    dt = jnp.dtype(cfg.dtype)
    q = jnp.einsum("...ld,dhk->...lhk", q_in.astype(dt), p["wq"].astype(dt))
    lead = q.shape[:-3]  # (..., T)
    lq, h, hd = q.shape[-3], q.shape[-2], q.shape[-1]
    lk = k.shape[-3]
    qf = q.reshape((-1, lq, h, hd))
    kf = k.reshape((-1, lk, h, hd))
    vf = v.reshape((-1, lk, h, hd))
    if kv_mask.ndim == 1:
        mf = kv_mask
    else:
        mf = jnp.broadcast_to(kv_mask[..., None, :], lead + (lk,)).reshape(-1, lk)
    # Trainable variant: identical Pallas forward (plus an lse vector), and
    # a chunked custom VJP — so 'auto'/'on' dispatch stays correct under
    # jax.grad (long-context pretraining).
    out = flash_row_attention_trainable(
        qf, kf, vf, mf, interpret=cfg.flash_interpret
    )
    out = out.reshape(lead + (lq, h, hd))
    out = jnp.einsum(
        "...lhd,hdm->...lm", out, p["wo"].astype(dt), preferred_element_type=jnp.float32
    )
    return out + p["bo"]


def _row_attn(cfg, p, q_in, k, v, ctx_mask):
    """Row-axis attention with flash dispatch. ctx_mask: [..., N]."""
    if _flash_applicable(cfg, q_in, k.shape[-3]):
        return _attn_core_flash(cfg, p, q_in, k, v, ctx_mask)
    return _attn_core(cfg, p, q_in, k, v, ctx_mask[..., None, :])


def _moe_mlp(cfg: TabICAConfig, p: Params, x: jnp.ndarray):
    """Top-k-routed mixture-of-experts MLP, computed densely over experts.

    Returns ``(out, aux)`` where ``aux`` is the Switch-style load-balance
    loss E * sum_e (f_e / k) * P_e — 1.0 under perfectly uniform routing,
    approaching E/k under full collapse (f_e = fraction of tokens routing
    to expert e, P_e = mean router probability; tests/test_moe.py anchors
    both values). All E experts run for every
    token (einsum over the expert axis, static shapes, no dispatch); the
    gate zeroes the non-top-k contributions exactly, so sharding the expert
    axis over an "ep" mesh axis makes the combine the GSPMD-derived psum.
    Aux statistics include padded tokens (they are embedded as zeros and
    routed like any other token) — acceptable bias, documented here.
    """
    dt = jnp.dtype(cfg.dtype)
    n_exp, k = cfg.num_experts, cfg.moe_top_k
    # Router in f32: gate quality and the aux loss are sensitive to rounding.
    glog = jnp.einsum(
        "...d,de->...e", x.astype(jnp.float32), p["router"].astype(jnp.float32)
    )
    kth = jax.lax.top_k(glog, k)[0][..., -1:]
    sel = glog >= kth
    gates = jax.nn.softmax(jnp.where(sel, glog, _NEG_INF), axis=-1)
    h = jnp.einsum("...d,edh->...eh", x.astype(dt), p["w1"].astype(dt)) + p["b1"]
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(dt)
    y = jnp.einsum(
        "...eh,ehd->...ed", h, p["w2"].astype(dt), preferred_element_type=jnp.float32
    ) + p["b2"]
    out = jnp.einsum("...e,...ed->...d", gates, y)
    batch_axes = tuple(range(glog.ndim - 1))
    frac = jnp.mean(sel.astype(jnp.float32), axis=batch_axes)
    prob = jnp.mean(jax.nn.softmax(glog, axis=-1), axis=batch_axes)
    aux = n_exp * jnp.sum((frac / k) * prob)
    return out, aux


def _mlp(cfg: TabICAConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "router" in p:
        return _moe_mlp(cfg, p, x)[0]
    dt = jnp.dtype(cfg.dtype)
    h = jnp.einsum("...d,dk->...k", x.astype(dt), p["w1"].astype(dt)) + p["b1"]
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(dt)
    return jnp.einsum(
        "...k,kd->...d", h, p["w2"].astype(dt), preferred_element_type=jnp.float32
    ) + p["b2"]


# ---------------------------------------------------------------------------
# Blocks: joint / context-only / query-only paths
#
# The context data flow never reads query rows, so `_block_ctx` computes
# exactly the same context states as the joint `_block`; `_block_qry` replays
# the query path against the cached per-layer context states. This identity
# (joint == encode+decode) is asserted in tests/test_transformer.py.
# ---------------------------------------------------------------------------


def _res_add(cfg, h, delta):
    """Residual add with f32 accumulation, stream kept in cfg.dtype."""
    return (h.astype(jnp.float32) + delta).astype(jnp.dtype(cfg.dtype))


def _feat_attn_step(cfg, p, h, token_mask):
    hn = _ln(p["ln_feat"], h)
    # token_mask: [..., T] — add a broadcast slot for the row axis (h is
    # [..., R, T, D]) so batched leading dims line up.
    return _res_add(
        cfg, h, _attn(cfg, p["feat_attn"], hn, hn, token_mask[..., None, :])
    )


def _mlp_step(cfg, p, h):
    return _res_add(cfg, h, _mlp(cfg, p["mlp"], _ln(p["ln_mlp"], h)))


def _mlp_step_aux(cfg, p, h):
    """MLP step that also returns the MoE load-balance aux loss (0.0 for a
    dense MLP) — used by the pretraining forward (forward(with_moe_aux=True))."""
    if "router" in p["mlp"]:
        delta, aux = _moe_mlp(cfg, p["mlp"], _ln(p["ln_mlp"], h))
    else:
        delta, aux = _mlp(cfg, p["mlp"], _ln(p["ln_mlp"], h)), jnp.float32(0.0)
    return _res_add(cfg, h, delta), aux


def _pool_rows(cfg, p, hn, token_mask):
    """Attention-pool each row's T cell tokens into K learned slots.

    hn: [..., R, T, D] (already LN'd). Returns [..., R, K, D]. Padded
    feature tokens are masked out of the pooling keys; the target token is
    always valid, so every row has at least one live key."""
    pp = p["pool"]
    slots = jnp.broadcast_to(pp["slots"], hn.shape[:-2] + pp["slots"].shape)
    return _attn(cfg, pp["pool_attn"], slots, hn, token_mask[..., None, :])


def _unpool_rows(cfg, p, hn, s):
    """Scatter K row-attended slots back onto the T tokens: tokens (queries)
    cross-attend over their row's slots. hn: [..., R, T, D]; s: [..., R, K, D]."""
    pp = p["pool"]
    return _attn(cfg, pp["unpool_attn"], hn, _ln(pp["ln_unpool"], s), None)


def _block_ctx(cfg, p, h_ctx, token_mask, ctx_mask, skip_mlp: bool = False):
    """Context rows through one block; returns new state + row-attn K/V
    cache (the projected keys/values queries will attend to). With
    cfg.row_pool_slots the cache holds K pooled-slot K/Vs per row instead
    of T per-token ones — same [..., slot_axis, N, H, hd] layout, so the
    decode path is shape-agnostic to pooling. ``skip_mlp`` stops before the
    MLP step (the aux-collecting joint block applies it itself)."""
    h_ctx = _feat_attn_step(cfg, p, h_ctx, token_mask)
    if cfg.row_pool_slots:
        pp = p["pool"]
        hn = _ln(p["ln_row"], h_ctx)  # [..., N, T, D]
        s = _pool_rows(cfg, p, hn, token_mask)  # [..., N, K, D]
        s = jnp.swapaxes(s, -3, -2)  # [..., K, N, D]
        sn = _ln(pp["ln_slot"], s).astype(jnp.dtype(cfg.dtype))
        k, v = _project_kv(cfg, p["row_attn"], sn)
        s = _res_add(cfg, s, _row_attn(cfg, p["row_attn"], sn, k, v, ctx_mask))
        s = jnp.swapaxes(s, -3, -2)  # [..., N, K, D]
        h_ctx = _res_add(cfg, h_ctx, _unpool_rows(cfg, p, hn, s))
    else:
        hc = jnp.swapaxes(h_ctx, -3, -2)  # [..., T, N, D]
        hc_n = _ln(p["ln_row"], hc).astype(jnp.dtype(cfg.dtype))
        k, v = _project_kv(cfg, p["row_attn"], hc_n)
        hc = _res_add(cfg, hc, _row_attn(cfg, p["row_attn"], hc_n, k, v, ctx_mask))
        h_ctx = jnp.swapaxes(hc, -3, -2)
    if skip_mlp:
        return h_ctx, (k, v)
    return _mlp_step(cfg, p, h_ctx), (k, v)


def _block_qry(cfg, p, h_qry, kv_cache, token_mask, ctx_mask, skip_mlp: bool = False):
    """Query rows through one block against the cached context K/V."""
    k, v = kv_cache
    h_qry = _feat_attn_step(cfg, p, h_qry, token_mask)
    if cfg.row_pool_slots:
        pp = p["pool"]
        hn = _ln(p["ln_row"], h_qry)  # [..., Q, T, D]
        s = _pool_rows(cfg, p, hn, token_mask)  # [..., Q, K, D]
        s = jnp.swapaxes(s, -3, -2)  # [..., K, Q, D]
        sn = _ln(pp["ln_slot"], s).astype(jnp.dtype(cfg.dtype))
        s = _res_add(cfg, s, _row_attn(cfg, p["row_attn"], sn, k, v, ctx_mask))
        s = jnp.swapaxes(s, -3, -2)  # [..., Q, K, D]
        h_qry = _res_add(cfg, h_qry, _unpool_rows(cfg, p, hn, s))
    else:
        hq = jnp.swapaxes(h_qry, -3, -2)  # [..., T, Q, D]
        hq_n = _ln(p["ln_row"], hq).astype(jnp.dtype(cfg.dtype))
        hq = _res_add(cfg, hq, _row_attn(cfg, p["row_attn"], hq_n, k, v, ctx_mask))
        h_qry = jnp.swapaxes(hq, -3, -2)
    if skip_mlp:
        return h_qry
    return _mlp_step(cfg, p, h_qry)


def _block_joint(cfg, p, h_ctx, h_qry, token_mask, ctx_mask):
    h_ctx, kv = _block_ctx(cfg, p, h_ctx, token_mask, ctx_mask)
    h_qry = _block_qry(cfg, p, h_qry, kv, token_mask, ctx_mask)
    return h_ctx, h_qry


def _block_joint_aux(cfg, p, h_ctx, h_qry, token_mask, ctx_mask):
    """Joint block that also returns the layer's MoE load-balance aux loss
    (context + query tokens both contribute — both route through the MLP)."""
    h_ctx, kv = _block_ctx(cfg, p, h_ctx, token_mask, ctx_mask, skip_mlp=True)
    h_qry = _block_qry(cfg, p, h_qry, kv, token_mask, ctx_mask, skip_mlp=True)
    h_ctx, aux_c = _mlp_step_aux(cfg, p, h_ctx)
    h_qry, aux_q = _mlp_step_aux(cfg, p, h_qry)
    return h_ctx, h_qry, 0.5 * (aux_c + aux_q)


# ---------------------------------------------------------------------------
# Embedding and head
# ---------------------------------------------------------------------------


def _embed(cfg, p, x, y_cell, feat_mask):
    # x: [..., R, F] -> [..., R, F+1, D]; y_cell: [..., R, D];
    # feat_mask: [..., F] broadcast over the row axis.
    cells = x[..., None] * p["w_feat"] + p["b_feat"]
    cells = jnp.where(feat_mask[..., None, :, None], cells, 0.0)
    return jnp.concatenate([cells, y_cell[..., None, :]], axis=-2)


def _embed_ctx(cfg, p, x_ctx, y_ctx, feat_mask):
    y_cell = y_ctx[..., None] * p["w_y"] + p["b_y"]
    return _embed(cfg, p, x_ctx, y_cell, feat_mask).astype(jnp.dtype(cfg.dtype))


def _embed_qry(cfg, p, x_qry, feat_mask):
    y_cell = jnp.broadcast_to(p["y_missing"], x_qry.shape[:-1] + (cfg.d_model,))
    return _embed(cfg, p, x_qry, y_cell, feat_mask).astype(jnp.dtype(cfg.dtype))


def _head(cfg, p, h_qry):
    out = _ln(p["ln"], h_qry[..., -1, :])
    out = jax.nn.gelu(out @ p["w1"] + p["b1"])
    return out @ p["w2"] + p["b2"]


def _masks(x_ctx, x_qry, feat_mask, ctx_mask):
    f = x_ctx.shape[-1]
    n = x_ctx.shape[-2]
    if feat_mask is None:
        feat_mask = jnp.ones(x_ctx.shape[:-2] + (f,), bool)
    if ctx_mask is None:
        ctx_mask = jnp.ones(x_ctx.shape[:-2] + (n,), bool)
    token_mask = jnp.concatenate(
        [feat_mask, jnp.ones(feat_mask.shape[:-1] + (1,), bool)], axis=-1
    )
    return feat_mask, token_mask, ctx_mask


# ---------------------------------------------------------------------------
# Public forward passes
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 7, 8))
def forward(
    cfg: TabICAConfig,
    params: Params,
    x_ctx: jnp.ndarray,  # [..., N, F] pre-normalized context features
    y_ctx: jnp.ndarray,  # [..., N]    pre-normalized context targets
    x_qry: jnp.ndarray,  # [..., Q, F] query features
    feat_mask: Optional[jnp.ndarray] = None,  # [..., F] active columns
    ctx_mask: Optional[jnp.ndarray] = None,  # [..., N] real rows
    remat: bool = False,
    with_moe_aux: bool = False,
):
    """Joint forward. Returns bar logits [..., Q, num_bars]; with
    ``with_moe_aux`` returns ``(logits, aux)`` where aux is the MoE
    load-balance loss averaged over layers (0.0 for a dense model) — the
    pretraining loss adds it weighted (pretrain/train.py batch_loss)."""
    feat_mask, token_mask, ctx_mask = _masks(x_ctx, x_qry, feat_mask, ctx_mask)
    e = params["embed"]
    h_ctx = _embed_ctx(cfg, e, x_ctx, y_ctx, feat_mask)
    h_qry = _embed_qry(cfg, e, x_qry, feat_mask)

    if with_moe_aux:

        def body(carry, p):
            hc, hq, aux = carry
            hc, hq, a = _block_joint_aux(cfg, p, hc, hq, token_mask, ctx_mask)
            return (hc, hq, aux + a), None

        if remat:
            body = jax.checkpoint(body)
        (h_ctx, h_qry, aux), _ = jax.lax.scan(
            body, (h_ctx, h_qry, jnp.float32(0.0)), params["blocks"]
        )
        return _head(cfg, params["head"], h_qry), aux / cfg.num_layers

    def body(carry, p):
        hc, hq = carry
        hc, hq = _block_joint(cfg, p, hc, hq, token_mask, ctx_mask)
        return (hc, hq), None

    if remat:
        body = jax.checkpoint(body)
    (h_ctx, h_qry), _ = jax.lax.scan(body, (h_ctx, h_qry), params["blocks"])
    return _head(cfg, params["head"], h_qry)


@partial(jax.jit, static_argnums=(0,))
def encode_context(
    cfg: TabICAConfig,
    params: Params,
    x_ctx: jnp.ndarray,
    y_ctx: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
):
    """Encode context once; returns the per-layer row-attention K/V cache
    ``(k, v)`` each of shape [L, ..., T, N, H, hd]. This is the analog of the
    reference's per-dimension ``model.fit`` (npe_pfn.py:140) — but it is pure
    and reusable across any number of query chunks, and caching the projected
    K/V removes all per-chunk context compute from the decode path."""
    feat_mask, token_mask, ctx_mask = _masks(x_ctx, x_ctx[..., :0, :], feat_mask, ctx_mask)
    h_ctx = _embed_ctx(cfg, params["embed"], x_ctx, y_ctx, feat_mask)

    def body(hc, p):
        hc, kv = _block_ctx(cfg, p, hc, token_mask, ctx_mask)
        return hc, kv

    _, cache = jax.lax.scan(body, h_ctx, params["blocks"])
    return cache


@partial(jax.jit, static_argnums=(0,))
def decode_queries(
    cfg: TabICAConfig,
    params: Params,
    cache,  # (k, v) each [L, ..., T, N, H, hd] from encode_context
    x_qry: jnp.ndarray,  # [..., Q, F]
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run query rows against a cached context. Analog of the reference's
    ``model.predict`` (npe_pfn.py:143), batched over all query rows."""
    n = cache[0].shape[-3]
    if ctx_mask is None:
        ctx_mask = jnp.ones(x_qry.shape[:-2] + (n,), bool)
    f = x_qry.shape[-1]
    if feat_mask is None:
        feat_mask = jnp.ones(x_qry.shape[:-2] + (f,), bool)
    token_mask = jnp.concatenate(
        [feat_mask, jnp.ones(feat_mask.shape[:-1] + (1,), bool)], axis=-1
    )
    h_qry = _embed_qry(cfg, params["embed"], x_qry, feat_mask)

    def body(hq, layer):
        p, kv = layer
        hq = _block_qry(cfg, p, hq, kv, token_mask, ctx_mask)
        return hq, None

    h_qry, _ = jax.lax.scan(body, h_qry, (params["blocks"], cache))
    return _head(cfg, params["head"], h_qry)
