#!/usr/bin/env python
"""CLI evaluation harness (reference: scripts/evaluate_ropefm.py:968-1125 /
evaluate_ropefm_batched.py:922-1049 analog).

    python scripts/evaluate_tasks.py --tasks two_moons gaussian_linear \
        --num_cal 10 50 200 1000 --seeds 0 1 2 3 4 --out results/
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", nargs="+", default=["two_moons", "gaussian_linear"])
    p.add_argument("--num_cal", nargs="+", type=int, default=[10, 50, 200, 1000])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    p.add_argument("--num_test", type=int, default=128)
    p.add_argument("--num_posterior_samples", type=int, default=256)
    p.add_argument("--filter_context_size", type=int, default=512)
    p.add_argument("--qry_chunk", type=int, default=1024)
    p.add_argument("--n_obs_eval", type=int, default=8,
                   help="test observations averaged for conditional metrics")
    p.add_argument("--target_transform", default="zscore",
                   choices=["zscore", "quantile"])
    p.add_argument("--feature_transform", default="none",
                   choices=["none", "quantile"],
                   help="TabPFN-style feature-side preprocessing member")
    p.add_argument("--refine_proposals", type=int, default=0,
                   help="simulator-in-the-loop ABC-SIR refinement budget per "
                        "observation (conditional tasks only); 0 = amortized")
    p.add_argument("--refine_eps_quantile", type=float, default=0.02)
    p.add_argument("--out", default="results")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from npe_pfn_tpu.eval import harness
    from npe_pfn_tpu.tasks import get_task

    failures = []
    for name in args.tasks:
        # One task blowing up must not skip its siblings (the reference's
        # per-task OAR jobs get this isolation for free; serial stages here
        # need it explicitly). Completed cells are already on disk either way.
        try:
            task = get_task(name)
            path = os.path.join(args.out, f"{task.name}.json")
            results = harness.evaluate_task(
                task,
                num_cal_grid=args.num_cal,
                seeds=args.seeds,
                num_test=args.num_test,
                num_posterior_samples=args.num_posterior_samples,
                estimator_kwargs={
                    "filter_context_size": args.filter_context_size,
                    "qry_chunk": args.qry_chunk,
                    "target_transform": args.target_transform,
                    "feature_transform": args.feature_transform,
                },
                results_path=path,
                n_obs_eval=args.n_obs_eval,
                refine_num_proposals=args.refine_proposals,
                refine_kwargs={"eps_quantile": args.refine_eps_quantile},
            )
            summary = harness.summarize(results)
            with open(os.path.join(args.out, f"{task.name}.summary.json"), "w") as f:
                json.dump(summary, f, indent=2)
            print(json.dumps({task.name: summary}, indent=2))
        except Exception:
            import traceback

            traceback.print_exc()
            failures.append(name)
    if failures:
        print(f"[evaluate_tasks] FAILED tasks: {failures}")
        sys.exit(1)


if __name__ == "__main__":
    main()
