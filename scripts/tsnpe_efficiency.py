#!/usr/bin/env python
"""Simulation-efficiency of TSNPE-PFN vs plain NPE-PFN.

The reference's sequential driver (reference: tsnpe_pfn.py:14-119) exists to
make small simulation budgets go further: each round truncates the proposal
to the estimated posterior support, so later rounds spend their simulations
where the posterior lives. This measures that claim quantitatively on tasks
with ground-truth posteriors: C2ST vs ground truth as a function of
(total simulation budget x number of rounds), same budget across rows —
the multi-round rows should win at small budgets.

Output: one JSON line per (task, budget, rounds, seed) cell, plus the file
given by --out (JSONL). Runs on CPU (tiny) or TPU (default scale).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", nargs="+", default=["two_moons", "slcp"])
    p.add_argument("--budgets", type=int, nargs="+", default=[256, 1024])
    p.add_argument("--rounds", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    p.add_argument("--num_posterior_samples", type=int, default=1024)
    p.add_argument("--num_support_samples", type=int, default=2048)
    p.add_argument("--out", default="results/tsnpe_efficiency.jsonl")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.eval import metrics
    from npe_pfn_tpu.models import checkpoint
    from npe_pfn_tpu.tsnpe import run_tsnpe

    model, trained = checkpoint.load_default()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    # Resume: skip cells already in the output file (the queue's stall
    # watchdog may restart this script; reference harness behavior,
    # evaluate_ropefm.py:937-941).
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["task"], r["budget"], r["rounds"], r["seed"]))
                except (json.JSONDecodeError, KeyError):
                    pass

    gt_cache = {}
    for task_name in args.tasks:
        task = npt.tasks.get_task(task_name)
        for seed in args.seeds:
            # Observation: θ_o ~ prior, x_o = sim(θ_o) — fresh per seed.
            k_obs = jax.random.fold_in(jax.random.PRNGKey(seed), 7)
            theta_o = task.prior.sample(k_obs, (1,))[0]
            x_o = task.simulator(jax.random.fold_in(k_obs, 1), theta_o)
            key = (task_name, seed)
            if key not in gt_cache:
                gt_cache[key] = task.posterior_sampler(
                    jax.random.fold_in(k_obs, 2), x_o, args.num_posterior_samples
                )
            gt = gt_cache[key]
            for budget in args.budgets:
                for rounds in args.rounds:
                    cell = (task_name, budget, rounds, seed)
                    if cell in done:
                        continue
                    t0 = time.perf_counter()
                    est = run_tsnpe(
                        task.simulator,
                        task.prior,
                        x_o,
                        num_rounds=rounds,
                        num_simulations=budget,
                        rng=jax.random.PRNGKey(100 + seed),
                        num_samples_to_estimate_support=args.num_support_samples,
                        model=model,
                    )
                    post = est.sample(
                        args.num_posterior_samples,
                        x_o,
                        rng=jax.random.PRNGKey(200 + seed),
                    )
                    # Host sync before timing: the remote runtime acks
                    # dispatch, not completion (see bench.py).
                    post = jax.device_get(post)
                    wall = time.perf_counter() - t0
                    c2st = float(
                        metrics.c2st(jax.random.PRNGKey(300 + seed), jnp.asarray(post), gt)
                    )
                    rec = {
                        "task": task_name,
                        "budget": budget,
                        "rounds": rounds,
                        "seed": seed,
                        "c2st": round(c2st, 4),
                        "wall_s": round(wall, 2),
                        "trained_ckpt": trained,
                    }
                    print(json.dumps(rec), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(rec) + "\n")

    # Summary: per (task, budget), best rounds by mean C2ST across seeds.
    rows = []
    with open(args.out) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    summary = {}
    for r in rows:
        summary.setdefault((r["task"], r["budget"], r["rounds"]), []).append(r["c2st"])
    for (t, b, n), cs in sorted(summary.items()):
        print(json.dumps({
            "summary": True, "task": t, "budget": b, "rounds": n,
            "mean_c2st": round(sum(cs) / len(cs), 4), "n_cells": len(cs),
        }), flush=True)


if __name__ == "__main__":
    main()
