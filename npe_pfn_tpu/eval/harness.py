"""Evaluation harness: the TPU rebuild of the reference's eval scripts.

Reference analogs: evaluate_ropefm.py / evaluate_ropefm_batched.py — per
task, for each calibration-set size and seed, fit the estimator on num_cal
sims, sample the posterior for a batch of test observations via
sample_batched, and score against ground truth (evaluate_ropefm.py:470-943).

Differences:
- tasks are generated on device by jittable simulators (the reference loads
  fixed .pt data artifacts, evaluate_ropefm.py:327-380, which don't exist
  here);
- conditional metrics use the analytic posterior when the task has one
  (gaussian_linear — the reference computes the same analytic posterior at
  evaluate_ropefm.py:505-585); otherwise the standard SBI *joint* diagnostic
  {(θ̂, x*)} vs {(θ*, x*)} (evaluate_ropefm.py:648-710 semantics);
- partial results are checkpointed after every (num_cal, seed) cell exactly
  like the reference (evaluate_ropefm.py:937-941), so preempted runs resume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..estimator import NPEPFN
from ..tasks import Task
from . import metrics as M


def _cell_key(num_cal: int, seed: int) -> str:
    return f"num_cal={num_cal}/seed={seed}"


def evaluate_task(
    task: Task,
    num_cal_grid: Sequence[int] = (10, 50, 200, 1000),
    seeds: Sequence[int] = (0, 1, 2, 3, 4),
    num_test: int = 128,
    num_posterior_samples: int = 256,
    estimator_kwargs: Optional[dict] = None,
    results_path: Optional[str] = None,
    metric_subsample: int = 512,
    n_obs_eval: int = 8,
    refine_num_proposals: int = 0,
    refine_kwargs: Optional[dict] = None,
) -> Dict:
    """Full grid evaluation; returns (and optionally checkpoints) results.

    ``refine_num_proposals > 0`` switches conditional-task posterior
    sampling to the simulator-in-the-loop ABC-SIR mode
    (``NPEPFN.sample_refined``): each observation's posterior costs
    ``refine_num_proposals`` extra simulator calls, which the cell records
    as ``sims_refine_per_obs`` next to the context budget so arms can be
    budget-matched (N context + P refine vs N+P plain — the same currency
    as TSNPE rounds, reference tsnpe_pfn.py:61). Only conditional tasks
    (those with a ground-truth sampler) support it: the joint diagnostic
    draws one θ per test observation, so per-observation refinement would
    multiply the budget by num_test without a matched plain arm.
    """
    estimator_kwargs = dict(estimator_kwargs or {})
    if "embedding_net" not in estimator_kwargs:
        # High-dimensional x (e.g. image tasks) exceeds the model's feature
        # budget — compress with a seeded random projection, the reference's
        # recipe for its 12288-D light_tunnel task (RandomProjection → 128,
        # evaluate_ropefm_batched.py:61-111).
        from ..embeddings import RandomProjectionEmbedding

        model = estimator_kwargs.get("model")
        f_budget = model.cfg.max_features if model is not None else 32
        if task.dim_x + task.dim_theta > f_budget:
            dout = min(f_budget - task.dim_theta, 24)
            if dout < 1:
                raise ValueError(
                    f"task {task.name!r}: dim_theta={task.dim_theta} leaves no "
                    f"room for x features in the model budget ({f_budget}); "
                    "use a model with larger max_features"
                )
            estimator_kwargs["embedding_net"] = RandomProjectionEmbedding(
                task.dim_x, dout, seed=0
            )
    results: Dict = {"task": task.name, "cells": {}}
    if results_path and os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)

    for seed in seeds:
        rng = jax.random.PRNGKey(seed)
        k_cal, k_test, k_post, k_metric, k_gt = jax.random.split(rng, 5)
        theta_test, x_test = task.simulate(k_test, num_test)
        # Ground-truth posteriors depend on (seed, obs) only — cache across
        # the num_cal grid (the SLCP MCMC sampler is the expensive one).
        gt_cache: Dict = {}

        for num_cal in num_cal_grid:
            key = _cell_key(num_cal, seed)
            if key in results["cells"]:
                continue
            t0 = time.time()
            theta_cal, x_cal = task.simulate(jax.random.fold_in(k_cal, num_cal), num_cal)
            est = NPEPFN(prior=task.prior, **estimator_kwargs)
            est.append_simulations(theta_cal, x_cal)

            cell: Dict = {"wall_s": None}
            if task.posterior_sampler is not None:
                # Conditional metrics vs analytic posterior, averaged over
                # n_obs_eval test observations (evaluate_ropefm.py:592-641
                # analog; default 8 is the CI tier — the reference-scale
                # protocol passes 16+).
                n_obs = min(n_obs_eval, num_test)
                c2sts, w2s, mmds, esss = [], [], [], []
                for j in range(n_obs):
                    kj = jax.random.fold_in(k_post, j)
                    if refine_num_proposals:
                        post = est.sample_refined(
                            num_posterior_samples, x_test[j], task.simulator,
                            rng=kj, num_proposals=refine_num_proposals,
                            **(refine_kwargs or {}),
                        )
                        esss.append(est.last_refine_diagnostics["ess"])
                    else:
                        post = est.sample(num_posterior_samples, x_test[j], rng=kj)
                    if j not in gt_cache:
                        gt_cache[j] = task.posterior_sampler(
                            jax.random.fold_in(k_gt, j), x_test[j],
                            num_posterior_samples,
                        )
                    gt = gt_cache[j]
                    c2sts.append(float(M.c2st(jax.random.fold_in(k_metric, j), post, gt)))
                    w2s.append(float(M.sinkhorn_w2(post, gt)))
                    mmds.append(float(M.mmd(post, gt)))
                cell["c2st"] = float(np.mean(c2sts))
                cell["wasserstein"] = float(np.mean(w2s))
                cell["mmd"] = float(np.mean(mmds))
                if refine_num_proposals:
                    cell["sims_refine_per_obs"] = int(refine_num_proposals)
                    cell["sims_total_per_obs"] = int(num_cal + refine_num_proposals)
                    cell["refine_ess_mean"] = float(np.mean(esss))
            else:
                if refine_num_proposals:
                    raise ValueError(
                        f"task {task.name!r} has no ground-truth sampler: the "
                        "joint diagnostic draws 1 θ per test obs, so refined "
                        "sampling has no budget-matched plain arm there"
                    )
                # Joint diagnostic: one posterior draw per test obs; compare
                # {(θ̂, x*)} against {(θ*, x*)} (evaluate_ropefm.py:648-710).
                post = est.sample_batched(1, x_test, rng=k_post)[:, 0, :]
                joint_est = jnp.concatenate([post, x_test], axis=1)
                joint_true = jnp.concatenate([theta_test, x_test], axis=1)
                n = min(metric_subsample, num_test)
                if task.x_image_shape is not None:
                    # Image-shaped x: trained conv discriminator over the
                    # image part + plain θ dims (the reference's embedding-
                    # aware CNN classifiers, evaluate_ropefm_batched.py:
                    # 118-304, 668-711).
                    # paired: both joint rows share the same x_i — group
                    # folds, or the classifier memorizes x labels and scores
                    # below chance on good posteriors (round-3 finding).
                    cell["c2st"] = float(
                        M.c2st_conv(
                            k_metric, joint_est[:n], joint_true[:n],
                            shape=tuple(task.x_image_shape),
                            d_extra=task.dim_theta,
                            paired=True,
                        )
                    )
                else:
                    cell["c2st"] = float(
                        M.c2st(k_metric, joint_est[:n], joint_true[:n], paired=True)
                    )
                cell["wasserstein"] = float(M.sinkhorn_w2(post[:n], theta_test[:n]))
                cell["mmd"] = float(M.mmd(post[:n], theta_test[:n]))
            cell["wall_s"] = time.time() - t0
            results["cells"][key] = cell
            print(f"[eval] {task.name} {key}: {cell}", flush=True)
            if results_path:
                _atomic_json(results_path, results)
    return results


def _atomic_json(path: str, obj) -> None:
    """Atomic JSON + pickle pair, like the reference's result saving
    (evaluate_ropefm.py:950-961 writes both)."""
    import pickle

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)
    pkl = path.rsplit(".", 1)[0] + ".pkl"
    with open(pkl + ".tmp", "wb") as f:
        pickle.dump(obj, f)
    os.replace(pkl + ".tmp", pkl)


def summarize(results: Dict) -> Dict:
    """Mean ± std per num_cal across seeds (plot_batched_results.py analog)."""
    agg: Dict = {}
    for key, cell in results["cells"].items():
        num_cal = int(key.split("/")[0].split("=")[1])
        agg.setdefault(num_cal, []).append(cell)
    out = {}
    for num_cal, cells in sorted(agg.items()):
        out[num_cal] = {
            m: {
                "mean": float(np.mean([c[m] for c in cells])),
                "std": float(np.std([c[m] for c in cells])),
            }
            for m in ("c2st", "wasserstein", "mmd")
            if all(m in c for c in cells)
        }
    return out
