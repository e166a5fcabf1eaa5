#!/usr/bin/env python
"""Why does 4-round TSNPE regress at tiny budgets? (VERDICT r4 item 8)

Measured: at the 256-sim budget on bernoulli_glm, 2 truncation rounds improve
mean C2ST 0.668→0.630 but 4 rounds REGRESS to ~0.72
(results/round5/tsnpe_efficiency_goodtasks.jsonl). Hypotheses:

  H1 proposal collapse — with 64 sims/round the early posterior is noisy,
     the support threshold truncates too tightly, later rounds sample a
     box smaller than the true posterior (acceptance ≈ 1 inside a wrong
     region; SIR ESS fine, support just wrong).
  H2 threshold too tight at small n — allowed_false_negatives=1e-4 means
     the threshold sits at the min of ~4096 posterior log-probs; with a
     noisy 64-sim posterior that min is an outlier-driven cliff.

Design: rounds × allowed_false_negatives grid, per-round PosteriorSupport
diagnostics (threshold, acceptance, prereject box) via
run_tsnpe(collect_diagnostics=...), plus per-round C2ST of the running
estimator and the fraction of TRUE posterior samples the final truncation
would reject (false-negative rate — direct evidence of collapse).

    python scripts/tsnpe_diagnose.py --out results/round7/tsnpe_rounds_diagnosis.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="bernoulli_glm")
    p.add_argument("--budget", type=int, default=256)
    p.add_argument("--rounds", nargs="+", type=int, default=[1, 2, 4])
    p.add_argument("--afns", nargs="+", type=float, default=[1e-4, 1e-2])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--num_posterior_samples", type=int, default=1024)
    p.add_argument("--out", default="results/round7/tsnpe_rounds_diagnosis.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from npe_pfn_tpu.eval import metrics as M
    from npe_pfn_tpu.tasks import get_task
    from npe_pfn_tpu.tsnpe import run_tsnpe

    task = get_task(args.task)
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

    for seed in args.seeds:
        k = jax.random.PRNGKey(seed)
        k_obs, k_run, k_post, k_gt, k_metric = jax.random.split(k, 5)
        theta_star = task.prior.sample(k_obs, (1,))[0]
        x_o = task.simulator(jax.random.fold_in(k_obs, 1), theta_star)
        gt = None
        for rounds in args.rounds:
            for afn in args.afns:
                if rounds == 1 and afn != args.afns[0]:
                    continue  # no truncation in 1-round runs
                key = f"seed={seed}/rounds={rounds}/afn={afn:g}"
                if key in out["cells"]:
                    continue
                diags = []
                est, proposals = run_tsnpe(
                    task.simulator, task.prior, x_o, num_rounds=rounds,
                    num_simulations=args.budget, rng=k_run,
                    allowed_false_negatives=afn,
                    collect_diagnostics=diags, return_proposals=True,
                )
                post = est.sample(
                    args.num_posterior_samples, x_o, rng=k_post
                )
                if gt is None:
                    gt = task.posterior_sampler(
                        k_gt, x_o, args.num_posterior_samples
                    )
                c2st = float(M.c2st(k_metric, post, gt))
                cell = {"c2st": round(c2st, 4), "rounds_diag": diags}
                # Direct collapse probe: how much TRUE posterior mass does
                # the FINAL proposal's truncation reject? (false-negative
                # rate of the support itself)
                if rounds > 1:
                    final_prop = proposals[-1]
                    inside = np.asarray(final_prop.support_check(gt))
                    cell["true_posterior_fnr"] = round(
                        float(1.0 - inside.mean()), 4
                    )
                out["cells"][key] = cell
                print(f"[tsnpe_diagnose] {key}: c2st={c2st:.4f} "
                      f"fnr={cell.get('true_posterior_fnr')}", flush=True)
                save()

    # aggregate
    agg = {}
    for key, cell in out["cells"].items():
        _, r, a = key.split("/")
        agg.setdefault(f"{r}/{a}", []).append(cell)
    out["summary"] = {
        k: {
            "c2st_mean": round(float(np.mean([c["c2st"] for c in v])), 4),
            "fnr_mean": round(float(np.mean(
                [c["true_posterior_fnr"] for c in v
                 if "true_posterior_fnr" in c] or [0.0]
            )), 4),
            "n": len(v),
        }
        for k, v in sorted(agg.items())
    }
    save()
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
