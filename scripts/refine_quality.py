#!/usr/bin/env python
"""Budget-matched quality comparison: amortized vs ABC-SIR-refined sampling.

The acceptance-gate measurement for the refinement mode (VERDICT r4 item 1):
at a FIXED total simulation budget B per observation, compare

  plain    — all B sims as estimator context (amortized sample),
  refined  — N_ctx context sims + P = B - N_ctx per-observation refinement
             sims (NPEPFN.sample_refined: simulate each proposal, ABC-SIR
             reweight), the same simulation currency as TSNPE rounds
             (reference tsnpe_pfn.py:61 splits budget across rounds the
             same way),
  refined_ic (optional) — refined with the prior/q importance correction.

Ground-truth posteriors are computed ONCE per (seed, obs) and shared across
arms. Results stream to --out after every cell (atomic, resumable) — the
committed artifact behind the sample_refined docstring's measured claims.

    python scripts/refine_quality.py --tasks two_moons slcp \
        --budget 10000 --ctx_refined 2000 --seeds 0 1 2 --n_obs 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", nargs="+", default=["two_moons", "slcp", "gaussian_mixture"])
    p.add_argument("--budget", type=int, default=10_000)
    p.add_argument("--ctx_refined", type=int, default=2_000)
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--n_obs", type=int, default=8)
    p.add_argument("--num_posterior_samples", type=int, default=1024)
    p.add_argument("--filter_context_size", type=int, default=2048)
    p.add_argument("--eps_quantile", type=float, default=0.02)
    p.add_argument("--with_ic", action="store_true",
                   help="add the importance-corrected refined arm")
    p.add_argument("--out", default="results/refine_quality.json")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from npe_pfn_tpu import NPEPFN
    from npe_pfn_tpu.eval import metrics as M
    from npe_pfn_tpu.tasks import get_task

    out = {"config": vars(args), "cells": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
        out["config"] = vars(args)

    def save():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)

    arms = ["plain", "refined"] + (["refined_ic"] if args.with_ic else [])
    p_refine = args.budget - args.ctx_refined
    assert p_refine > 0

    for name in args.tasks:
        task = get_task(name)
        if task.posterior_sampler is None:
            print(f"[refine_quality] skip {name}: no ground-truth sampler")
            continue
        for seed in args.seeds:
            rng = jax.random.PRNGKey(seed)
            k_cal, k_test, k_post, k_metric, k_gt = jax.random.split(rng, 5)
            _, x_test = task.simulate(k_test, args.n_obs)
            gt_cache = {}
            for arm in arms:
                key = f"{name}/seed={seed}/{arm}"
                if key in out["cells"]:
                    continue
                t0 = time.time()
                num_cal = args.budget if arm == "plain" else args.ctx_refined
                theta_cal, x_cal = task.simulate(k_cal, num_cal)
                est = NPEPFN(
                    prior=task.prior,
                    filter_context_size=args.filter_context_size,
                    qry_chunk=1024,
                )
                est.append_simulations(theta_cal, x_cal)
                c2sts, esss, epss = [], [], []
                for j in range(args.n_obs):
                    kj = jax.random.fold_in(k_post, j)
                    if arm == "plain":
                        post = est.sample(
                            args.num_posterior_samples, x_test[j], rng=kj
                        )
                    else:
                        post = est.sample_refined(
                            args.num_posterior_samples, x_test[j],
                            task.simulator, rng=kj,
                            num_proposals=p_refine,
                            eps_quantile=args.eps_quantile,
                            importance_correct=(arm == "refined_ic"),
                        )
                        d = est.last_refine_diagnostics
                        esss.append(d["ess"])
                        epss.append(d["eps"])
                    if j not in gt_cache:
                        gt_cache[j] = task.posterior_sampler(
                            jax.random.fold_in(k_gt, j), x_test[j],
                            args.num_posterior_samples,
                        )
                    c2sts.append(float(M.c2st(
                        jax.random.fold_in(k_metric, j), post, gt_cache[j]
                    )))
                cell = {
                    "c2st_mean": float(np.mean(c2sts)),
                    "c2st_per_obs": [round(c, 4) for c in c2sts],
                    "sims_context": num_cal,
                    "sims_refine_per_obs": 0 if arm == "plain" else p_refine,
                    "sims_total_per_obs": args.budget,
                    "wall_s": round(time.time() - t0, 1),
                }
                if esss:
                    cell["refine_ess_mean"] = float(np.mean(esss))
                    cell["refine_eps_mean"] = float(np.mean(epss))
                out["cells"][key] = cell
                print(f"[refine_quality] {key}: {cell}", flush=True)
                save()

    # Per-task per-arm aggregate across seeds (the headline table).
    table = {}
    for key, cell in out["cells"].items():
        name, _, arm = key.split("/")
        table.setdefault(name, {}).setdefault(arm, []).append(cell["c2st_mean"])
    out["table"] = {
        name: {
            arm: {
                "c2st_mean": float(np.mean(v)),
                "c2st_std": float(np.std(v)),
                "n_seeds": len(v),
            }
            for arm, v in arms_d.items()
        }
        for name, arms_d in table.items()
    }
    save()
    print(json.dumps(out["table"], indent=2))


if __name__ == "__main__":
    main()
