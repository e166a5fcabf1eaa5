#!/usr/bin/env python
"""Simulation-based calibration (SBC) of the posterior estimator.

For (θ*, x*) ~ p(θ)p(x|θ), the rank of θ*_d among posterior samples
θ ~ q(θ|x*) is uniform iff q is calibrated. Reports per-dimension KS
p-values of the rank distribution plus central-interval coverage.

Uses sample_batched: all test pairs ride one scan per θ-dimension.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="gaussian_linear")
    p.add_argument("--dim", type=int, default=5)
    p.add_argument("--num_pairs", type=int, default=64)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--num_train", type=int, default=2000)
    p.add_argument("--num_context", type=int, default=512)
    p.add_argument("--qry_chunk", type=int, default=512)
    args = p.parse_args()

    import jax

    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import scipy.stats

    import npe_pfn_tpu as npt

    kwargs = {"dim": args.dim} if args.task == "gaussian_linear" else {}
    task = npt.tasks.get_task(args.task, **kwargs)
    theta_train, x_train = task.simulate(jax.random.PRNGKey(0), args.num_train)
    theta_test, x_test = task.simulate(jax.random.PRNGKey(1), args.num_pairs)

    est = npt.NPEPFN(
        prior=task.prior, filter_context_size=args.num_context,
        qry_chunk=args.qry_chunk,
    )
    est.append_simulations(theta_train, x_train)
    post = est.sample_batched(
        args.num_samples, x_test, rng=jax.random.PRNGKey(2), max_iters=1
    )  # [P, S, d]

    post = np.asarray(post)
    true = np.asarray(theta_test)
    ranks = (post < true[:, None, :]).sum(axis=1)  # [P, d] in 0..S
    out = {"task": task.name, "num_pairs": args.num_pairs}
    pvals, coverages = [], []
    for d in range(true.shape[1]):
        u = (ranks[:, d] + 0.5) / (args.num_samples + 1)
        pvals.append(float(scipy.stats.kstest(u, "uniform").pvalue))
        lo, hi = np.quantile(post[:, :, d], [0.05, 0.95], axis=1)
        coverages.append(float(((true[:, d] >= lo) & (true[:, d] <= hi)).mean()))
    out["sbc_ks_pvalues"] = [round(v, 4) for v in pvals]
    out["coverage_90"] = [round(v, 4) for v in coverages]
    out["frac_dims_calibrated"] = round(float(np.mean(np.array(pvals) > 0.05)), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
