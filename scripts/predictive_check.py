#!/usr/bin/env python
"""Posterior-predictive sanity across all simulator tasks.

For tasks without tractable posteriors, measure the predictive gain:
mean ||sim(θ̂) − x_o|| for θ̂ ~ q(θ|x_o) vs θ ~ prior. Gain >> 1 means the
posterior concentrates on parameters that reproduce the observation.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", nargs="+", default=[
        "two_moons", "slcp", "lotka_volterra", "sir", "pendulum",
    ])
    p.add_argument("--num_train", type=int, default=2000)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--num_context", type=int, default=512)
    p.add_argument("--qry_chunk", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import npe_pfn_tpu as npt

    results = {}
    for name in args.tasks:
        task = npt.tasks.get_task(name)
        theta, x = task.simulate(jax.random.PRNGKey(0), args.num_train)
        est = npt.NPEPFN(
            prior=task.prior, filter_context_size=args.num_context,
            qry_chunk=args.qry_chunk,
        )
        est.append_simulations(theta, x)
        x_o = x[0]
        post = est.sample(args.num_samples, x_o, rng=jax.random.PRNGKey(1), max_iters=2)
        keys = jax.random.split(jax.random.PRNGKey(2), args.num_samples)
        sim_v = jax.jit(jax.vmap(task.simulator))
        d_post = float(jnp.linalg.norm(sim_v(keys, post) - x_o, axis=1).mean())
        prior_theta = task.prior.sample(jax.random.PRNGKey(3), (args.num_samples,))
        d_prior = float(jnp.linalg.norm(sim_v(keys, prior_theta) - x_o, axis=1).mean())
        rec = {
            "task": name,
            "post_pred_dist": round(d_post, 4),
            "prior_pred_dist": round(d_prior, 4),
            "predictive_gain": round(d_prior / max(d_post, 1e-9), 3),
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
