"""Expert-parallel (EP) parameter placement for MoE TabICA.

The reference has no mixture-of-experts and no distributed backend at all
(SURVEY §2.5); MoE (models/config.py num_experts) is this framework's
capacity-scaling option, and EP is its TPU-native sharding: the expert
axis of every MoE MLP shards over an "ep" mesh axis.

Design mirrors tensor_parallel.py: EP is *parameter placement, not code*.
The MoE forward computes all experts densely (einsums over the expert
axis — transformer._moe_mlp), so sharding that axis makes each device run
only its local experts, and GSPMD turns the gate-weighted combine
(``...e,...ed->...d``, a contraction over experts) into the psum over ICI.
No token dispatch/all-to-all is needed: routing is a gate *weight*, not a
gather, which is exactly why the dense-MoE formulation is the idiomatic
TPU shape at small expert counts.

Sharding map (axis "ep"), leading axis is the stacked layer axis:
- ``router`` [L, D, E]        -> replicated (O(D·E), every device gates);
- ``w1``     [L, E, D, hid]   -> experts sharded;
- ``b1``     [L, E, hid]      -> experts sharded;
- ``w2``     [L, E, hid, D]   -> experts sharded;
- ``b2``     [L, E, D]        -> experts sharded (the +b2 inside the
  expert-major ``y`` is expert-local; the combine reduces it);
- everything outside MoE MLPs replicated — or tensor-parallel when
  composing: ``ep_place(..., tp_axis=...)`` merges the tensor_parallel
  specs for attention/dense params with the EP specs for expert params,
  so one placement call yields a tp×ep model.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.regressor import TabICAModel
from .tensor_parallel import param_pspecs as _tp_pspecs

# Keys of a MoE MLP dict (transformer.init_params, num_experts > 0).
_MOE_SPECS = {
    "router": P(),
    "w1": P(None, "ep", None, None),
    "b1": P(None, "ep", None),
    "w2": P(None, "ep", None, None),
    "b2": P(None, "ep", None),
}


def _rename(spec: P, axis: str) -> P:
    return P(*[axis if s == "ep" else s for s in spec])


def ep_pspecs(params, axis: str = "ep", tp_axis: Optional[str] = None):
    """PartitionSpec pytree: MoE MLP dicts shard experts over ``axis``;
    everything else is replicated, or tensor-parallel over ``tp_axis`` when
    given (tensor_parallel.param_pspecs merged in)."""
    base = _tp_pspecs(params, tp_axis) if tp_axis else None

    def walk(node, base_node):
        if isinstance(node, dict):
            if set(node.keys()) == set(_MOE_SPECS):
                return {k: _rename(s, axis) for k, s in _MOE_SPECS.items()}
            return {
                k: walk(v, base_node[k] if base_node is not None else None)
                for k, v in node.items()
            }
        return base_node if base_node is not None else P()

    return walk(params, base)


def ep_place(
    mesh: Mesh,
    model: TabICAModel,
    axis: str = "ep",
    tp_axis: Optional[str] = None,
) -> TabICAModel:
    """Return the model with MoE expert axes placed over ``axis`` (and,
    optionally, attention/dense params tensor-parallel over ``tp_axis``).

    The placed model is a drop-in for every jitted forward — encode/decode,
    the autoregressive sampler, the fused rejection driver — exactly like
    tp_place: GSPMD derives the expert-local compute and the combine psum
    from placement alone.
    """
    if model.cfg.num_experts == 0:
        raise ValueError("ep_place requires a MoE model (cfg.num_experts > 0)")
    n_ep = mesh.shape[axis]
    if model.cfg.num_experts % n_ep != 0:
        raise ValueError(
            f"ep axis size {n_ep} must divide num_experts={model.cfg.num_experts}"
        )
    if tp_axis is not None:
        n_tp = mesh.shape[tp_axis]
        if model.cfg.num_heads % n_tp != 0:
            raise ValueError(
                f"tp axis size {n_tp} must divide num_heads={model.cfg.num_heads}"
            )
    specs = ep_pspecs(model.params, axis, tp_axis)
    params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        model.params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
    borders = jax.device_put(model.borders, NamedSharding(mesh, P()))
    return TabICAModel(cfg=model.cfg, params=params, borders=borders)
