#!/usr/bin/env python
"""Fit the post-hoc bar-logit calibration temperature (VERDICT r4 item 4).

SBC measured half the posterior dims mis-calibrated on two_moons
(results/round6/sbc_two_moons.log: 90% coverage 0.875/0.953). The principled
single-knob fix: one scalar τ dividing the bar logits at prediction
(TabICAModel.temperature, models/regressor.py predict_logits), fitted by
minimizing held-out NLL — a proper scoring rule, so τ* is the maximum-
likelihood recalibration and cannot overfit direction-by-direction.

Held-out data = fresh synthetic tasks from the SAME pretraining prior
(npe_pfn_tpu/pretrain/prior.py, the shipped v6 knobs) under a seed far
outside the training stream — never the evaluation benchmarks, so the
reported eval deltas stay honest.

The logits are computed ONCE per dataset; NLL(τ) just rescales them, so the
τ-grid search is free. Writes results/temperature_fit.json; --bake writes a
calibrated copy of the checkpoint with τ* stored under __temperature__.

    JAX_PLATFORMS=cpu python scripts/fit_temperature.py --num_datasets 64
    python scripts/fit_temperature.py --bake checkpoints/tabica_v6_best_cal.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="checkpoint to calibrate (default: shipped DEFAULT)")
    p.add_argument("--num_datasets", type=int, default=64)
    p.add_argument("--num_ctx", type=int, default=768)
    p.add_argument("--seed", type=int, default=987_654,
                   help="held-out stream; pretraining folds in step indices "
                        "from 0 so any large fixed seed is disjoint")
    p.add_argument("--tau_grid", type=int, default=81)
    p.add_argument("--tau_lo", type=float, default=0.5)
    p.add_argument("--tau_hi", type=float, default=2.0)
    p.add_argument("--bake", default=None,
                   help="write a calibrated checkpoint copy here")
    p.add_argument("--out", default="results/temperature_fit.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from npe_pfn_tpu.models import bar_distribution as bar
    from npe_pfn_tpu.models import checkpoint as C
    from npe_pfn_tpu.models import regressor, transformer
    from npe_pfn_tpu.pretrain import prior

    ckpt_path = args.ckpt or C.default_checkpoint_path()
    model = C.load(ckpt_path)
    print(f"[fit_temperature] {ckpt_path}: d={model.cfg.d_model} "
          f"current τ={float(model.temperature):.4f}", flush=True)

    # The shipped v6 training regime (scripts/pretrain_v6.sh) — calibration
    # data must look like training data, just from a held-out stream.
    pcfg = prior.PriorConfig(
        num_ctx=args.num_ctx,
        num_features=model.cfg.max_features,
        p_heteroscedastic=0.3, p_heavy_tail=0.2, p_categorical_feats=0.2,
        p_multimodal=0.3, p_sym_fold=0.7,
        mm_mu_input_scale=0.3, mm_sig_lo=-1.7,
    )

    @jax.jit
    def query_logits(batch):
        def one(x_ctx, y_ctx, x_qry, y_qry, feat_mask, ctx_mask):
            stats = regressor.compute_stats(x_ctx, y_ctx, ctx_mask)
            xn_c = regressor.normalize_x(stats, x_ctx) * feat_mask[None, :]
            yn_c = regressor.normalize_y(stats, y_ctx) * ctx_mask
            xn_q = regressor.normalize_x(stats, x_qry) * feat_mask[None, :]
            yn_q = regressor.normalize_y(stats, y_qry)
            yn_q = jnp.clip(yn_q, -model.cfg.bar_range, model.cfg.bar_range)
            logits = transformer.forward(
                model.cfg, model.params, xn_c, yn_c, xn_q, feat_mask,
                ctx_mask, False, False,
            )
            return logits, yn_q

        return jax.vmap(one)(
            batch.x_ctx, batch.y_ctx, batch.x_qry, batch.y_qry,
            batch.feat_mask, batch.ctx_mask,
        )

    # Small dataset chunks bound host memory on the 1-core box.
    chunk = 8
    all_logits, all_y = [], []
    for i in range(0, args.num_datasets, chunk):
        k = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        batch = prior.sample_tasks(k, min(chunk, args.num_datasets - i), pcfg)
        lg, yn = query_logits(batch)
        all_logits.append(np.asarray(lg, np.float32).reshape(-1, lg.shape[-1]))
        all_y.append(np.asarray(yn, np.float32).reshape(-1))
        print(f"[fit_temperature] datasets {i + lg.shape[0]}/{args.num_datasets}",
              flush=True)
    logits = jnp.asarray(np.concatenate(all_logits))
    y = jnp.asarray(np.concatenate(all_y))

    @jax.jit
    def nll_at(tau):
        return jnp.mean(bar.nll(model.borders, logits / tau, y))

    taus = np.geomspace(args.tau_lo, args.tau_hi, args.tau_grid)
    nlls = np.array([float(nll_at(t)) for t in taus])
    i_best = int(np.argmin(nlls))
    tau_star = float(taus[i_best])
    result = {
        "checkpoint": ckpt_path,
        "num_datasets": args.num_datasets,
        "num_queries": int(y.shape[0]),
        "seed": args.seed,
        "tau_star": tau_star,
        "nll_at_tau1": float(nll_at(1.0)),
        "nll_at_tau_star": float(nlls[i_best]),
        "grid": {f"{t:.4f}": float(n) for t, n in zip(taus[::8], nlls[::8])},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "grid"},
                     indent=2))
    if i_best in (0, len(taus) - 1):
        print("[fit_temperature] WARNING: τ* on grid edge — widen the range")

    if args.bake:
        calibrated = model.replace(temperature=jnp.asarray(tau_star))
        C.save(args.bake, calibrated)
        print(f"[fit_temperature] baked τ*={tau_star:.4f} → {args.bake}")


if __name__ == "__main__":
    main()
