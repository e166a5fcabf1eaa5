#!/usr/bin/env python
"""Posterior-quality gate for the current TabICA checkpoint.

Quick, quantitative, runs on CPU or TPU:
  - gaussian_linear (5D): C2ST + moment errors vs the analytic posterior
  - two_moons: posterior-predictive distance (simulate x from sampled θ) and
    a bimodality check (the posterior has two moons; a unimodal fit fails)
Prints one JSON line per task + a summary line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_context", type=int, default=384)
    p.add_argument("--num_samples", type=int, default=512)
    p.add_argument("--num_train", type=int, default=1000)
    p.add_argument("--qry_chunk", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.eval import metrics
    from npe_pfn_tpu.models import checkpoint

    model, trained = checkpoint.load_default()
    out = {"trained": trained}

    # ---- gaussian linear vs analytic ------------------------------------
    task = npt.tasks.get_task("gaussian_linear", dim=5)
    theta, x = task.simulate(jax.random.PRNGKey(args.seed), args.num_train)
    est = npt.NPEPFN(
        prior=task.prior, model=model,
        filter_context_size=args.num_context, qry_chunk=args.qry_chunk,
    )
    est.append_simulations(theta, x)
    c2sts, mean_errs, std_ratios = [], [], []
    for j in range(3):
        x_o = x[j]
        post = est.sample(args.num_samples, x_o, rng=jax.random.PRNGKey(10 + j), max_iters=1)
        gt = task.posterior_sampler(jax.random.PRNGKey(20 + j), x_o, args.num_samples)
        c2sts.append(float(metrics.c2st(jax.random.PRNGKey(30 + j), post, gt)))
        mean_errs.append(float(jnp.abs(post.mean(0) - gt.mean(0)).mean()))
        std_ratios.append(float((post.std(0) / gt.std(0)).mean()))
    rec = {
        "task": "gaussian_linear_5d",
        "c2st": round(float(np.mean(c2sts)), 4),
        "mean_abs_err": round(float(np.mean(mean_errs)), 4),
        "std_ratio": round(float(np.mean(std_ratios)), 4),
    }
    print(json.dumps(rec), flush=True)
    out["gaussian_linear"] = rec

    # ---- two moons: predictive check + bimodality ------------------------
    task = npt.tasks.get_task("two_moons")
    theta, x = task.simulate(jax.random.PRNGKey(args.seed + 1), args.num_train)
    est = npt.NPEPFN(
        prior=task.prior, model=model,
        filter_context_size=args.num_context, qry_chunk=args.qry_chunk,
    )
    est.append_simulations(theta, x)
    theta_o = jnp.array([0.3, -0.4])
    x_o = task.simulator(jax.random.PRNGKey(99), theta_o)
    post = est.sample(args.num_samples, x_o, rng=jax.random.PRNGKey(40), max_iters=1)
    keys = jax.random.split(jax.random.PRNGKey(41), post.shape[0])
    x_pred = jax.jit(jax.vmap(task.simulator))(keys, post)
    pred_dist = float(jnp.linalg.norm(x_pred - x_o, axis=1).mean())
    # Prior-predictive baseline for scale.
    prior_theta = task.prior.sample(jax.random.PRNGKey(42), (post.shape[0],))
    x_prior = jax.jit(jax.vmap(task.simulator))(keys, prior_theta)
    prior_dist = float(jnp.linalg.norm(x_prior - x_o, axis=1).mean())
    # Bimodality: two-moons posterior is symmetric under (θ0,θ1)->(-θ1,-θ0)
    # reflection for this observation family; check both half-planes hit.
    s = np.asarray(post)
    frac_upper = float((s[:, 0] + s[:, 1] > 0).mean())
    rec = {
        "task": "two_moons",
        "post_predictive_dist": round(pred_dist, 4),
        "prior_predictive_dist": round(prior_dist, 4),
        "predictive_gain": round(prior_dist / max(pred_dist, 1e-9), 3),
        "mode_balance": round(min(frac_upper, 1 - frac_upper), 3),
    }
    print(json.dumps(rec), flush=True)
    out["two_moons"] = rec
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
