#!/usr/bin/env python
"""Sampling-strategy benchmark (reference: scripts/sampling_comparison.py and
notebooks/benchmark_sample_batched.ipynb).

Measures the reference's two headline comparisons on TPU:
  1. batched sample_batched(M obs × S samples) vs a Python loop of
     sample() calls (reference reports 3.2-7x at M=5..50; the scan kernel
     here shares ALL dim-encodes across observations, so the gap grows);
  2. Strategy A (N samples, 1 obs) vs Strategy B (1 sample × N obs looped)
     (reference: 9.1x in favor of A).
Also runs the KS-test distributional-equivalence check between batched and
looped samples (benchmark_sample_batched.ipynb cell 13).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *a, **k):
    import jax

    t0 = time.perf_counter()
    out = fn(*a, **k)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_obs_grid", nargs="+", type=int, default=[5, 10, 20, 50])
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--num_train", type=int, default=1000)
    p.add_argument("--out", default="results/sampling_benchmark.json")
    args = p.parse_args()

    import jax
    import numpy as np

    from npe_pfn_tpu import NPEPFN
    from npe_pfn_tpu.eval.metrics import ks_test_per_dim
    from npe_pfn_tpu.tasks import get_task

    # Linear-Gaussian toy with 3D theta / 10D x like the reference's
    # benchmark setup (benchmark_sample_batched.ipynb).
    task = get_task("gaussian_linear", dim=3)
    import jax.numpy as jnp

    theta, x = task.simulate(jax.random.PRNGKey(0), args.num_train)
    x = jnp.concatenate([x, jnp.tile(x, (1, 3))[:, :7]], axis=1)  # 10D x

    est = NPEPFN(prior=task.prior, filter_context_size=512, qry_chunk=1024)
    est.append_simulations(theta, x)

    results = {"batched_vs_loop": [], "strategyA_vs_B": None}

    for m in args.num_obs_grid:
        xs = x[:m]
        # Warm-up both paths.
        est.sample_batched(args.num_samples, xs, rng=jax.random.PRNGKey(1), max_iters=1)
        est.sample(args.num_samples, xs[0], rng=jax.random.PRNGKey(1), max_iters=1)

        _, t_batched = timed(
            est.sample_batched, args.num_samples, xs, rng=jax.random.PRNGKey(2),
            max_iters=1,
        )
        t0 = time.perf_counter()
        loop_samples = []
        for j in range(m):
            loop_samples.append(
                est.sample(args.num_samples, xs[j], rng=jax.random.PRNGKey(3 + j),
                           max_iters=1)
            )
        jax.block_until_ready(loop_samples)
        t_loop = time.perf_counter() - t0
        rec = {
            "num_obs": m,
            "t_loop_s": round(t_loop, 3),
            "t_batched_s": round(t_batched, 3),
            "speedup": round(t_loop / t_batched, 2),
        }
        print(json.dumps(rec), flush=True)
        results["batched_vs_loop"].append(rec)

    # Distributional equivalence: batched vs loop on the first obs. Use an
    # unfiltered estimator so both paths condition on the identical context
    # (sample() filters per-obs, sample_batched() never does — reference
    # npe_pfn.py:201-204; the reference's own KS check shares context too).
    est_eq = NPEPFN(
        prior=task.prior, filter_type="no_filtering",
        filter_context_size=args.num_train, qry_chunk=1024,
    )
    est_eq.append_simulations(theta, x)
    batched = est_eq.sample_batched(2000, x[:1], rng=jax.random.PRNGKey(10), max_iters=1)[0]
    looped = est_eq.sample(2000, x[0], rng=jax.random.PRNGKey(11), max_iters=1)
    pvals = ks_test_per_dim(batched, looped)
    results["ks_pvalues"] = [float(v) for v in pvals]
    results["ks_frac_above_0.05"] = float((pvals > 0.05).mean())
    print("KS p-values:", results["ks_pvalues"], flush=True)

    # Strategy A vs B (reference sampling_comparison.py:85-128).
    n = 10
    est.sample(n, x[0], rng=jax.random.PRNGKey(20), max_iters=1)  # warm
    _, t_a = timed(est.sample, n, x[0], rng=jax.random.PRNGKey(21), max_iters=1)
    t0 = time.perf_counter()
    for j in range(n):
        est.sample(1, x[j], rng=jax.random.PRNGKey(22 + j), max_iters=1)
    t_b = time.perf_counter() - t0
    results["strategyA_vs_B"] = {
        "t_A_s": round(t_a, 3), "t_B_s": round(t_b, 3),
        "speedup": round(t_b / t_a, 2),
    }
    print(json.dumps(results["strategyA_vs_B"]), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
