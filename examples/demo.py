#!/usr/bin/env python
"""Demo: training-free posterior inference on two moons (the reference's
demo.ipynb as a runnable script).

    python examples/demo.py            # writes examples/demo_posterior.png

Walkthrough:
 1. simulate (θ, x) pairs from the prior + simulator (on device),
 2. bind them as context — NO training,
 3. sample the posterior for one observation,
 4. run the sequential variant (TSNPE) and compare,
 5. plot both posteriors.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true", help="small sizes for CPU")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import npe_pfn_tpu as npt

    ctx = 128 if args.fast else 512
    chunk = 128 if args.fast else 1024
    n_post = 512 if args.fast else 2048
    kw = dict(filter_context_size=ctx, qry_chunk=chunk)

    task = npt.tasks.get_task("two_moons")
    rng = jax.random.PRNGKey(0)

    # A ground-truth parameter and its observation.
    theta_o = jnp.array([0.3, -0.4])
    x_o = task.simulator(jax.random.PRNGKey(99), theta_o)
    print(f"true θ = {theta_o}, observed x = {x_o}")

    # --- single-round NPE-PFN -------------------------------------------
    theta, x = task.simulate(rng, 1000)
    est = npt.NPEPFN(prior=task.prior, **kw)
    est.append_simulations(theta, x)
    posterior_samples = est.sample(n_post, x_o, rng=jax.random.PRNGKey(1))
    print(f"NPE-PFN posterior mean: {posterior_samples.mean(0)}")

    # --- sequential TSNPE-PFN -------------------------------------------
    est_seq = npt.run_tsnpe(
        task.simulator, task.prior, x_o,
        num_rounds=3, num_simulations=1000, rng=jax.random.PRNGKey(2),
        num_samples_to_estimate_support=512 if args.fast else 1024,
        support_batch_size=2048 if args.fast else 16_384,
        **kw,
    )
    seq_samples = est_seq.sample(n_post, x_o, rng=jax.random.PRNGKey(3))
    print(f"TSNPE-PFN posterior mean: {seq_samples.mean(0)}")

    # --- plot --------------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharex=True, sharey=True)
    for ax, samples, title in [
        (axes[0], posterior_samples, "NPE-PFN (1 round)"),
        (axes[1], seq_samples, "TSNPE-PFN (3 rounds)"),
    ]:
        s = np.asarray(samples)
        ax.scatter(s[:, 0], s[:, 1], s=2, alpha=0.25)
        ax.plot(*np.asarray(theta_o), "r*", markersize=14, label="true θ")
        ax.set_title(title)
        ax.set_xlim(-1, 1)
        ax.set_ylim(-1, 1)
        ax.legend()
    out = os.path.join(os.path.dirname(__file__), "demo_posterior.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
