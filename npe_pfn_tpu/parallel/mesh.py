"""Device-mesh parallelism for pretraining and sampling.

The reference has NO distributed backend at all (SURVEY §2.5: no
torch.distributed, single device + OAR array jobs). The TPU-native
replacements here:

- **Data-parallel pretraining**: shard the synthetic task batch over a
  1-D ``("data",)`` mesh; params stay replicated; XLA inserts the grad
  psum over ICI automatically from the sharding constraint.
- **Data-parallel sampling**: posterior sampling is embarrassingly parallel
  over query rows (observations × samples). Shard the query-row axis; the
  context cache and weights are replicated; zero collectives in steady
  state — the ideal ICI-free layout.
- (Planned, round 2+) **context/sequence sharding**: blockwise row-attention
  over context rows to lift the context ceiling (SP analog; SURVEY §2.5).

Multi-chip hardware is unavailable in this environment; these paths are
validated on a virtual 8-device CPU mesh (tests + __graft_entry__.dryrun).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import TabICAConfig
from ..models.regressor import TabICAModel
from ..pretrain import prior
from ..pretrain import train as train_mod


def get_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard a TaskBatch (or any pytree with leading dataset axis) over the
    mesh's data axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)


def make_sharded_train_step(
    mesh: Mesh,
    cfg: TabICAConfig,
    tcfg: train_mod.TrainConfig,
    pcfg: prior.PriorConfig,
    axis: str = "data",
):
    """Data-parallel train step: datasets sharded, params replicated.

    Data is generated on device inside the jit and constrained to the data
    sharding, so each chip simulates its own shard of the synthetic prior —
    no host transfers, no cross-chip data motion except the grad psum XLA
    derives from the constraint.
    """
    data_spec = P(axis)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, borders, rng):
        data_rng, rng = jax.random.split(rng)
        batch = prior.sample_tasks(data_rng, tcfg.num_datasets, pcfg)
        batch = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, data_spec)
            ),
            batch,
        )
        loss, grads = jax.value_and_grad(
            lambda p: train_mod.batch_loss(
                cfg, borders, p, batch, moe_aux_weight=tcfg.moe_aux_weight
            )
        )(params)
        opt = train_mod.make_optimizer(tcfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_and_place(params, opt_state):
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return params, opt_state

    return step, init_and_place


def sharded_autoregressive_sample(
    mesh: Mesh,
    model: TabICAModel,
    theta_ctx,
    x_ctx,
    ctx_mask,
    x_qry,
    rng,
    qry_chunk: int = 1024,
    axis: str = "data",
    target_transform: str = "zscore",
):
    """Posterior sampling with the query-row axis sharded over the mesh.

    Query rows are independent (transformer masks guarantee it), so each
    device samples its slice against a replicated context cache. Throughput
    scales linearly with chips; no collectives in the hot loop.
    """
    from ..estimator import autoregressive_sample

    n_dev = mesh.devices.size
    q = x_qry.shape[0]
    assert q % (n_dev * qry_chunk) == 0 or q % n_dev == 0, (
        f"query rows {q} must divide over {n_dev} devices"
    )
    repl = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(axis))
    model = jax.device_put(model, repl)
    theta_ctx = jax.device_put(theta_ctx, repl)
    x_ctx = jax.device_put(x_ctx, repl)
    ctx_mask = jax.device_put(ctx_mask, repl)
    x_qry = jax.device_put(x_qry, row_sharded)

    fn = jax.jit(
        lambda m, tc, xc, cm, xq, k: autoregressive_sample(
            m, tc, xc, cm, xq, k, min(qry_chunk, q // n_dev), target_transform
        ),
        out_shardings=(row_sharded, row_sharded),
    )
    return fn(model, theta_ctx, x_ctx, ctx_mask, x_qry, rng)
