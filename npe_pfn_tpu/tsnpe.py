"""Truncated sequential NPE-PFN driver (TSNPE-PFN).

Rebuild of the reference's ``run_tsnpe_pfn`` (reference: tsnpe_pfn.py:14-119)
with the sbi orchestration dependency replaced by a vmapped JAX simulate
step: simulators are pure functions ``sim(rng, theta) -> x`` run on device.

Per round: simulate from the current proposal, accumulate ALL rounds' sims,
re-bind the estimator context, and build a PosteriorSupport over the new
posterior as the next round's proposal (tsnpe_pfn.py:80-117). One round
degrades to plain NPE-PFN (tsnpe_pfn.py:56-58).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .distributions import Distribution
from .estimator import NPEPFN
from .support import PosteriorSupport

logger = logging.getLogger(__name__)

Simulator = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


def simulate_for_sbi(
    rng: jax.Array,
    simulator: Simulator,
    proposal: Distribution,
    num_simulations: int,
    simulation_batch_size: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(θ, x) pairs from proposal + simulator — the sbi.inference
    ``simulate_for_sbi`` analog (tsnpe_pfn.py:86-91). The simulator is
    vmapped and jitted; chunked to bound device memory."""
    k_theta, k_sim = jax.random.split(rng)
    theta = proposal.sample(k_theta, (num_simulations,))
    theta = jnp.asarray(theta, jnp.float32)
    sim_batched = jax.jit(jax.vmap(simulator))
    xs = []
    for start in range(0, num_simulations, simulation_batch_size):
        stop = min(start + simulation_batch_size, num_simulations)
        keys = jax.random.split(jax.random.fold_in(k_sim, start), stop - start)
        xs.append(sim_batched(keys, theta[start:stop]))
    return theta, jnp.concatenate(xs, axis=0)


def run_tsnpe(
    simulator: Simulator,
    prior: Distribution,
    observation: jnp.ndarray,
    num_rounds: int = 5,
    num_simulations: int = 1000,
    rng: Optional[jax.Array] = None,
    estimator: Optional[NPEPFN] = None,
    log_prob_mode: str = "autoregressive",  # ref default ratio_based
    # (tsnpe_pfn.py:25); flipped for the same reason as NPEPFN.log_prob_mode
    sampling_method: str = "rejection",
    filtering: str = "no_filtering",
    allowed_false_negatives: float = 0.0001,
    oversample_sir: int = 32,
    num_samples_to_estimate_support: int = 4096,
    simulation_batch_size: int = 8192,
    support_batch_size: int = 16_384,
    return_proposals: bool = False,
    refine_final: int = 0,
    refine_num_samples: int = 1000,
    refine_kwargs: Optional[dict] = None,
    collect_diagnostics: Optional[list] = None,
    **estimator_kwargs,
):
    """Sequential truncated NPE-PFN (tsnpe_pfn.py:14-119).

    Returns the fitted estimator (and optionally the per-round proposals).
    num_rounds=1 is plain NPE-PFN (tsnpe_pfn.py:56-58); the per-round budget
    is num_simulations // num_rounds (tsnpe_pfn.py:61).

    ``refine_final > 0`` reserves that many simulations from
    ``num_simulations`` for a final simulator-in-the-loop ABC-SIR pass
    (``NPEPFN.sample_refined``): rounds then split the REMAINING budget, so
    the total simulator-call count stays num_simulations — refinement is
    budget-accounted in the same currency as rounds. The return value grows
    a trailing ``samples [refine_num_samples, dθ]`` element.

    ``collect_diagnostics``: pass a list to receive one dict per truncation
    round with the PosteriorSupport acceptance rate / threshold / SIR ESS —
    the instrumentation behind results/round7/tsnpe_rounds_diagnosis.md.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if refine_final >= num_simulations:
        raise ValueError("refine_final must leave budget for rounds")
    observation = jnp.asarray(observation, jnp.float32)
    if estimator is None:
        estimator = NPEPFN(
            prior=prior,
            filter_type=filtering,
            log_prob_mode=log_prob_mode,
            **estimator_kwargs,
        )

    n_per_round = (num_simulations - refine_final) // num_rounds
    proposal: Distribution = prior
    proposals = [proposal]
    all_theta, all_x = [], []

    for rnd in range(num_rounds):
        rng, sim_rng, sup_rng = jax.random.split(rng, 3)
        theta, x = simulate_for_sbi(
            sim_rng, simulator, proposal, n_per_round, simulation_batch_size
        )
        all_theta.append(theta)
        all_x.append(x)
        estimator.append_simulations(
            jnp.concatenate(all_theta, axis=0), jnp.concatenate(all_x, axis=0)
        )
        logger.info(
            "TSNPE round %d/%d: %d total sims", rnd + 1, num_rounds,
            estimator.num_simulations,
        )
        if rnd == num_rounds - 1:
            break
        proposal = PosteriorSupport(
            prior=prior,
            posterior=estimator,
            x_o=observation,
            rng=sup_rng,
            num_samples_to_estimate_support=num_samples_to_estimate_support,
            allowed_false_negatives=allowed_false_negatives,
            sampling_method=sampling_method,
            oversample_sir=oversample_sir,
            batch_size=support_batch_size,
        )
        proposals.append(proposal)
        if collect_diagnostics is not None:
            # Exercise one proposal draw so acceptance/ESS are measured on
            # the object that will actually generate next round's θ.
            rng, k_diag = jax.random.split(rng)
            proposal.sample(k_diag, (min(1024, n_per_round),))
            collect_diagnostics.append(
                {
                    "round": rnd + 1,
                    "log_prob_threshold": proposal.log_prob_threshold,
                    **{
                        k: v
                        for k, v in proposal.last_diagnostics.items()
                        if isinstance(v, (int, float, bool))
                    },
                }
            )

    out = [estimator]
    if return_proposals:
        out.append(proposals)
    if refine_final > 0:
        rng, k_ref = jax.random.split(rng)
        samples = estimator.sample_refined(
            refine_num_samples, observation, simulator, rng=k_ref,
            num_proposals=refine_final, **(refine_kwargs or {}),
        )
        out.append(samples)
    return out[0] if len(out) == 1 else tuple(out)
