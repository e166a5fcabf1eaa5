"""Generic rejection-sampling driver (TPU-shaped).

Rebuild of the reference's ``accept_reject_sample`` (reference:
accept_reject_sampler.py:9-91): loop proposal → accept-mask → accumulate
until ``num_samples``, with a ``max_iter`` escape hatch that fills the
remainder with the last *unfiltered* batch so termination is guaranteed
(accept_reject_sampler.py:74-77), and acceptance-rate reporting
(accept_reject_sampler.py:82-91).

TPU differences: the reference adaptively resizes its proposal batches
(1.5 × remaining / acceptance_rate clamped to [100, max],
accept_reject_sampler.py:67-72) — dynamic shapes that would recompile every
iteration under XLA. Here every iteration draws the same fixed-size batch
(compile once); the batch is already oversized by the caller, so the
expected iteration count is comparable.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.profiling import Progress

ProposalFn = Callable[[jax.Array, int], Tuple[jnp.ndarray, Any]]
AcceptFn = Callable[[jnp.ndarray], jnp.ndarray]


def accept_reject_sample(
    rng: jax.Array,
    proposal_fn: ProposalFn,
    accept_reject_fn: AcceptFn,
    num_samples: int,
    batch_size: Optional[int] = None,
    max_iters: int = 10,
    show_progress: bool = False,
) -> Tuple[jnp.ndarray, Any, float]:
    """Draw ``num_samples`` accepted samples.

    proposal_fn(rng, n) -> (samples [n, d], aux pytree with leading dim n);
    accept_reject_fn(samples) -> bool mask [n].

    Returns (samples [num_samples, d], aux trimmed alike, acceptance_rate).
    """
    batch_size = batch_size or num_samples
    progress = Progress(num_samples, "accept_reject", enabled=show_progress)

    collected: list = []
    collected_aux: list = []
    total_drawn = total_accepted = 0
    remaining = num_samples
    last = None
    for _ in range(max_iters):
        rng, k = jax.random.split(rng)
        samples, aux = proposal_fn(k, batch_size)
        mask = np.asarray(accept_reject_fn(samples))
        last = (np.asarray(samples), jax.tree_util.tree_map(np.asarray, aux))
        total_drawn += mask.shape[0]
        total_accepted += int(mask.sum())
        idx = np.nonzero(mask)[0][:remaining]
        if idx.size:
            collected.append(last[0][idx])
            collected_aux.append(jax.tree_util.tree_map(lambda a: a[idx], last[1]))
            remaining -= idx.size
            progress.update(int(idx.size))
        if remaining <= 0:
            break
    if remaining > 0:
        # Escape hatch (accept_reject_sampler.py:74-77): fill with the last
        # unfiltered batch (tiled if the batch is smaller than the deficit);
        # callers see it in the acceptance rate.
        reps = -(-remaining // last[0].shape[0])

        def fill(a):
            tile_spec = (reps,) + (1,) * (a.ndim - 1)
            return np.tile(a, tile_spec)[:remaining]

        collected.append(fill(last[0]))
        collected_aux.append(jax.tree_util.tree_map(fill, last[1]))
    samples = jnp.asarray(np.concatenate(collected, axis=0)[:num_samples])
    aux = jax.tree_util.tree_map(
        lambda *parts: jnp.asarray(np.concatenate(parts, axis=0)[:num_samples]),
        *collected_aux,
    )
    acceptance = total_accepted / max(total_drawn, 1)
    return samples, aux, acceptance
