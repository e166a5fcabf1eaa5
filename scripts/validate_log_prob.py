#!/usr/bin/env python
"""Validate both log_prob modes against exact posterior densities.

The reference offers two density estimates — autoregressive NLL
(npe_pfn.py:462-524) and the ratio-based classifier path
(npe_pfn.py:526-570) — but never validates either against a known density.
Here, tasks with a closed-form posterior (gaussian_linear,
high_dim_gaussian, gaussian_linear_uniform — Task.posterior_log_prob)
provide exact ground truth: we score θ drawn from the exact posterior plus
a widened cloud (tail coverage) and report, per mode:

  - pearson r between estimated and exact log-densities (shape agreement),
  - MAE after removing the median offset (the ratio path is normalized only
    up to classifier calibration; AR should need no offset),
  - the raw median offset itself (calibration of the normalizer).

    python scripts/validate_log_prob.py --out results/log_prob_validation.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", nargs="+",
                   default=["gaussian_linear", "high_dim_gaussian",
                            "gaussian_linear_uniform"])
    p.add_argument("--num_train", type=int, default=1024)
    p.add_argument("--num_eval", type=int, default=512)
    p.add_argument("--num_obs", type=int, default=2)
    p.add_argument("--num_ratio_samples", type=int, default=4096)
    p.add_argument("--ratio_context_sizes", nargs="+", type=int,
                   default=[512],
                   help="sweep the in-context classifier budget (VERDICT r2 "
                   "weak #5: is 512 rows the bottleneck?)")
    p.add_argument("--ratio_fits", nargs="+", type=int, default=[1, 4],
                   help="classifier-ensemble sizes to sweep (num_ratio_fits)")
    p.add_argument("--qry_chunk", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.models import checkpoint

    model, trained = checkpoint.load_default()
    assert trained, "needs a trained checkpoint"

    def compare(est_lp, exact_lp):
        est_lp = np.asarray(est_lp, np.float64)
        exact_lp = np.asarray(exact_lp, np.float64)
        ok = np.isfinite(est_lp) & np.isfinite(exact_lp)
        e, g = est_lp[ok], exact_lp[ok]
        offset = float(np.median(e - g))
        r = float(np.corrcoef(e, g)[0, 1]) if e.size > 2 else float("nan")
        return {
            "pearson_r": round(r, 4),
            "mae_offset_corrected": round(float(np.mean(np.abs(e - g - offset))), 4),
            "median_offset": round(offset, 4),
            "frac_finite": round(float(ok.mean()), 4),
        }

    records = []
    ckpt_name = os.path.normpath(checkpoint.default_checkpoint_path())
    for task_name in args.tasks:
        try:
            _run_task(args, task_name, model, ckpt_name, records, npt, jax,
                      jnp, checkpoint, compare)
        except Exception as e:  # per-task isolation: one bad task ≠ no artifact
            rec = {"task": task_name, "error": f"{type(e).__name__}: {e}"}
            records.append(rec)
            print(json.dumps(rec), flush=True)
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(records, f, indent=1)

    if args.out:
        print(f"wrote {args.out}")


def _run_task(args, task_name, model, ckpt_name, records, npt, jax, jnp,
              checkpoint, compare):
    task = npt.tasks.get_task(task_name)
    assert task.posterior_log_prob is not None, task_name
    theta, x = task.simulate(jax.random.PRNGKey(0), args.num_train)
    for j in range(args.num_obs):
        x_o = x[j]
        k = jax.random.PRNGKey(100 + j)
        k_post, k_wide, k_ar, k_ratio = jax.random.split(k, 4)
        th_post = task.posterior_sampler(k_post, x_o, args.num_eval)
        # Widened cloud: double the spread around the posterior mean
        # so the comparison also covers low-density tails.
        mean = th_post.mean(0)
        th_wide = mean + 2.0 * (
            task.posterior_sampler(k_wide, x_o, args.num_eval // 4) - mean
        )
        th = jnp.concatenate([th_post, th_wide], axis=0)
        exact = task.posterior_log_prob(x_o, th)

        # AR is independent of the ratio-classifier config: score once.
        est = npt.NPEPFN(
            prior=task.prior, model=model, qry_chunk=args.qry_chunk
        )
        est.append_simulations(theta, x)
        rec = {
            "task": task_name, "obs": j, "mode": "autoregressive",
            "num_train": args.num_train, "checkpoint": ckpt_name,
            **compare(est.log_prob(th, x_o, rng=k_ar, mode="autoregressive"),
                      exact),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

        for rcs in args.ratio_context_sizes:
            for nf in args.ratio_fits:
                est = npt.NPEPFN(
                    prior=task.prior, model=model, qry_chunk=args.qry_chunk,
                    ratio_context_size=rcs, num_ratio_fits=nf,
                )
                est.append_simulations(theta, x)
                lp_ratio = est.log_prob(
                    th, x_o, rng=k_ratio, mode="ratio_based",
                    num_ratio_samples=args.num_ratio_samples,
                )
                rec = {
                    "task": task_name, "obs": j, "mode": "ratio_based",
                    "ratio_context_size": rcs, "num_ratio_fits": nf,
                    "num_train": args.num_train, "checkpoint": ckpt_name,
                    **compare(lp_ratio, exact),
                }
                records.append(rec)
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
