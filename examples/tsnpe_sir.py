#!/usr/bin/env python
"""TSNPE-PFN sequential rounds on the SIR epidemic model
(BASELINE.json config 5: restricted proposals via support truncation).

    python examples/tsnpe_sir.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import npe_pfn_tpu as npt

    task = npt.tasks.get_task("sir")
    theta_o = jnp.array([jnp.log(0.5), jnp.log(0.15)])  # true (log β, log γ)
    x_o = task.simulator(jax.random.PRNGKey(7), theta_o)
    print(f"true θ = {np.asarray(theta_o).round(3)}")

    est, proposals = npt.run_tsnpe(
        task.simulator,
        task.prior,
        x_o,
        num_rounds=3,
        num_simulations=1500,
        rng=jax.random.PRNGKey(0),
        sampling_method="rejection",
        num_samples_to_estimate_support=1024,
        return_proposals=True,
    )

    post = est.sample(2048, x_o, rng=jax.random.PRNGKey(1))
    print(f"posterior mean  = {np.asarray(post.mean(0)).round(3)}")
    print(f"posterior std   = {np.asarray(post.std(0)).round(3)}")
    for i, prop in enumerate(proposals[1:], start=2):
        print(
            f"round {i} proposal diagnostics: {prop.last_diagnostics}"
        )

    # Posterior predictive check.
    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    x_pred = jax.jit(jax.vmap(task.simulator))(keys, post[:256])
    d_post = float(jnp.linalg.norm(x_pred - x_o, axis=1).mean())
    prior_theta = task.prior.sample(jax.random.PRNGKey(3), (256,))
    x_prior = jax.jit(jax.vmap(task.simulator))(keys, prior_theta)
    d_prior = float(jnp.linalg.norm(x_prior - x_o, axis=1).mean())
    print(f"posterior-predictive distance {d_post:.4f} vs prior {d_prior:.4f}")


if __name__ == "__main__":
    main()
