"""Tensor-parallel (Megatron-style) parameter placement for TabICA.

The reference has no tensor parallelism (SURVEY §2.5: no distributed backend
at all); this is the TPU-native capability that lets one model forward span
several chips when d_model/head count grow past a single chip's HBM or when
per-chip latency matters more than throughput.

Design: TP here is *data placement, not code*. GSPMD propagates shardings
from operands, so sharding the attention projections over the head axis and
the MLP weights over the hidden axis makes XLA run every einsum in the
existing forward pass tensor-parallel and insert the reduce (psum over ICI)
after ``wo``/``w2`` automatically — the canonical Megatron schedule, derived
by the compiler from placement alone. No forward-pass changes, so the SAME
placed model runs tensor-parallel through ``fit_encode``/``decode``, the
autoregressive sampler, and the fused rejection driver.

Sharding map (axis "tp"):
- attention ``wq/wk/wv`` [L, D, H, hd]  -> heads sharded (each device owns
  H/n_tp heads end-to-end: QK^T, softmax, PV all head-local);
- attention ``wo``       [L, H, hd, D]  -> heads sharded; the contraction
  over (H, hd) yields the psum;
- MLP ``w1`` [L, D, hid] / ``b1`` [L, hid] -> hidden sharded (column
  parallel); ``w2`` [L, hid, D] -> hidden sharded (row parallel, psum);
- everything else (embeddings, LayerNorms, head, biases into the residual
  stream) replicated — they are O(D) and not worth collectives.

Composes with the other meshes: on a ("data", "tp") mesh, query rows ride
"data" (see mesh.sharded_autoregressive_sample) while each replica's matmuls
split over "tp".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.regressor import TabICAModel

# Keys of attention-parameter dicts (transformer.init_params attn_params()).
_ATTN_SPECS = {
    "wq": P(None, None, "tp", None),
    "wk": P(None, None, "tp", None),
    "wv": P(None, None, "tp", None),
    "wo": P(None, "tp", None, None),
    "bo": P(),
}
_MLP_SPECS = {
    "w1": P(None, None, "tp"),
    "b1": P(None, "tp"),
    "w2": P(None, "tp", None),
    "b2": P(),
}


def _rename(spec: P, axis: str) -> P:
    return P(*[axis if s == "tp" else s for s in spec])


def param_pspecs(params, axis: str = "tp"):
    """PartitionSpec pytree matching a TabICA params pytree.

    Attention dicts (feat/row/pool/unpool) shard over heads, MLPs over the
    hidden axis, everything else replicated."""

    def walk(node):
        if isinstance(node, dict):
            keys = set(node.keys())
            if keys == set(_ATTN_SPECS):
                return {k: _rename(s, axis) for k, s in _ATTN_SPECS.items()}
            if keys == set(_MLP_SPECS):
                return {k: _rename(s, axis) for k, s in _MLP_SPECS.items()}
            return {k: walk(v) for k, v in node.items()}
        return P()

    return walk(params)


def tp_place(mesh: Mesh, model: TabICAModel, axis: str = "tp") -> TabICAModel:
    """Return the model with params placed tensor-parallel over ``axis``.

    The placed model is a drop-in: every jitted forward (encode/decode,
    autoregressive sampling, the fused rejection sampler) compiles
    tensor-parallel from the input shardings alone. Head count and MLP
    hidden width must divide the axis size for an even split (XLA would
    otherwise pad).
    """
    if model.cfg.num_experts:
        raise ValueError(
            "tp_place on a MoE model would leave the expert MLPs (the bulk "
            "of the params) replicated; use expert_parallel.ep_place(mesh, "
            "model, tp_axis=...) to shard experts and attention together"
        )
    n_tp = mesh.shape[axis]
    if model.cfg.num_heads % n_tp != 0:
        raise ValueError(
            f"tp axis size {n_tp} must divide num_heads={model.cfg.num_heads}"
        )
    if (model.cfg.d_model * model.cfg.mlp_ratio) % n_tp != 0:
        raise ValueError("the tp axis size must divide the MLP hidden width")
    specs = param_pspecs(model.params, axis)
    params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        model.params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
    repl = NamedSharding(mesh, P())
    borders = jax.device_put(model.borders, repl)
    return TabICAModel(cfg=model.cfg, params=params, borders=borders)


def tp_forward_logits(
    mesh: Mesh,
    model: TabICAModel,
    x_ctx: jnp.ndarray,
    y_ctx: jnp.ndarray,
    x_qry: jnp.ndarray,
    axis: str = "tp",
    data_axis: Optional[str] = None,
):
    """Convenience: place the model TP and run fit_encode + predict_logits.

    Queries ride ``data_axis`` when the mesh has one (tp×dp). Used by the
    dryrun and tests; real serving should call ``tp_place`` once and reuse
    the placed model."""
    from ..models import regressor

    placed = tp_place(mesh, model, axis)
    if data_axis is not None and data_axis in mesh.shape:
        x_qry = jax.device_put(x_qry, NamedSharding(mesh, P(data_axis)))
    fitted = regressor.fit_encode(placed, x_ctx, y_ctx)
    return regressor.predict_logits(placed, fitted, x_qry)
