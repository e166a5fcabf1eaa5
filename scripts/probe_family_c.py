#!/usr/bin/env python
"""Track whether a checkpoint has learned family-C conditional shapes.

The round-4 diagnosis (results/DIAGNOSIS.md) showed the v4 model smears
thin separated modes into one lobe because the pretraining prior never
produced them. v5 trains on an enriched prior (family C mixture
conditionals + sign-folded inverse tasks); this probe scores any
checkpoint against the EXACT family-C conditionals (analytic — `_family_c`
returns its mixture), plus two canonical hand-built shapes:

  bimodal     two thin components at ±0.9 marginal-SD (the two_moons
              step-2 requirement)
  spike+slab  sd ratio 10 mixture at a shared mean (gaussian_mixture's
              posterior shape)

For each probe task the model sees `--ctx` in-context rows and is scored
by KL(exact || model) on a y-grid at query rows, and by whether it
recovers the right number of modes. Appends one JSON line per run to
`results/probe_family_c.jsonl` so snapshots trace a learning curve.

Round-4 addendum (results/DIAGNOSIS.md): KL vs the EXACT conditional is
partly irreducible — with unit-scale MLP mean fields and sigma down to
10^-2.5, no in-context estimator can recover the true mixture from ~500
rows (a kNN-KDE oracle scores KL ~2.4 on the same tasks, WORSE than the
v4 model's ~2.2). Each run therefore also reports metrics that stay
meaningful under irreducibility: `kl_knn_baseline` (beat-the-oracle-free-
baseline), and the held-out NLL gap `nll_model - nll_exact` at the true
query draws (drops exactly when the model learns, regardless of how hard
the exact target is). Family C is probed at BOTH 8 active features (the
training-max regime) and 2 (the two_moons-like regime).

CPU-friendly: run with JAX_PLATFORMS=cpu and PYTHONPATH without
/root/.axon_site (CLAUDE.md); one probe run at 768 ctx x 32 tasks takes a
few minutes on the 1-core box.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="checkpoint path (default: checkpoints/DEFAULT)")
    p.add_argument("--num_tasks", type=int, default=32)
    p.add_argument("--ctx", type=int, default=768)
    p.add_argument("--num_qry", type=int, default=4)
    p.add_argument("--grid", type=int, default=768)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mm_mu_input_scale", type=float, default=1.0,
                   help="family-C mode-location smoothness for the PROBE "
                   "tasks (match the training regime being scored; <1 = "
                   "the learnable v6 regime, results/DIAGNOSIS.md)")
    p.add_argument("--mm_sig_lo", type=float, default=-2.5,
                   help="log10 sigma floor of the probe's family-C tasks")
    p.add_argument("--p_marginal_mixture", type=float, default=0.0,
                   help="probe family-C marginal-mixture share (match the "
                   "training regime being scored)")
    p.add_argument("--out", default="results/probe_family_c.jsonl")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from npe_pfn_tpu.models import bar_distribution as bar
    from npe_pfn_tpu.models import checkpoint as ckpt_mod
    from npe_pfn_tpu.models import regressor
    from npe_pfn_tpu.pretrain import prior

    if args.ckpt:
        model = ckpt_mod.load(args.ckpt)
        ckpt_name = args.ckpt
    else:
        model, trained = ckpt_mod.load_default()
        if not trained:
            raise RuntimeError("no trained checkpoint found")
        ckpt_name = ckpt_mod.default_checkpoint_path()
    if jax.default_backend() != "tpu" and model.cfg.dtype == "bfloat16":
        model = dataclasses.replace(
            model, cfg=dataclasses.replace(model.cfg, dtype="float32")
        )

    f = model.cfg.max_features
    n_active = 8
    R = args.ctx + args.num_qry
    pcfg = prior.PriorConfig(
        num_features=n_active, num_ctx=args.ctx, num_qry=args.num_qry,
        max_active_features=n_active,
    )
    col = jnp.arange(f)
    feat_mask = col < n_active

    def mixture_density(grid, mu, sig, w):
        """[G] density of sum_k w_k N(mu_k, sig_k^2)."""
        z = (grid[None, :] - mu[:, None]) / sig[:, None]
        comp = np.exp(-0.5 * z * z) / (np.sqrt(2 * np.pi) * sig[:, None])
        return (w[:, None] * comp).sum(0)

    def model_density(fitted, logits, grid):
        zg = (jnp.asarray(grid) - fitted.stats.mu_y) / fitted.stats.sd_y
        lp = np.asarray(
            jax.vmap(lambda lg: bar.log_prob(model.borders, lg, zg))(logits),
            np.float64,
        ) - float(jnp.log(fitted.stats.sd_y))
        return np.exp(lp - lp.max(axis=1, keepdims=True)), lp

    def kl_grid(pe, pm, dg, eps=1e-12):
        pe = np.maximum(pe, 0.0); pe /= max(pe.sum() * dg, 1e-300)
        pm = np.maximum(pm, 0.0); pm /= max(pm.sum() * dg, 1e-300)
        m = pe > eps
        return float(np.sum(pe[m] * (np.log(pe[m]) - np.log(np.maximum(pm[m], eps))) * dg))

    borders_np = np.asarray(model.borders, np.float64)

    def bar_floor(pe, grid, dg, mu_y, sd_y):
        """KL(exact || its projection onto the bar head) — the
        representational floor for this conditional (thin spikes can be
        sub-bin, so the floor is NOT negligible for family C; reporting
        kl_excess = kl - floor makes the learning curve interpretable)."""
        borders = borders_np * sd_y + mu_y
        pe = np.maximum(pe, 0.0)
        pe = pe / max(pe.sum() * dg, 1e-300)
        cdf = np.cumsum(pe) * dg
        cdf_at = np.interp(borders, grid, cdf, left=0.0, right=1.0)
        mass = np.diff(cdf_at)
        widths = np.maximum(np.diff(borders), 1e-12)
        dens = mass / widths
        k = np.clip(np.searchsorted(borders[1:-1], grid, side="right"),
                    0, len(mass) - 1)
        return kl_grid(pe, dens[k], dg)

    def count_modes(grid, p, prom_frac=0.12):
        p = np.maximum(p, 0.0)
        if p.max() <= 0:
            return 0
        p = p / p.max()
        n = 0
        for i in range(1, len(p) - 1):
            if p[i] >= p[i - 1] and p[i] > p[i + 1] and p[i] > prom_frac:
                # prominence: must dip below p[i]*(1-prom) on both sides
                left = p[:i].min() if i > 0 else 0.0
                lo = p[i] * (1 - prom_frac)
                j = i
                while j > 0 and p[j] > lo:
                    j -= 1
                k = i
                while k < len(p) - 1 and p[k] > lo:
                    k += 1
                if (j > 0 or p[0] < lo) and (k < len(p) - 1 or p[-1] < lo):
                    n += 1
        return n

    def score_task(xin_act, y_ctx_raw, exact_fn, y_all):
        """xin_act [R, n_act]; y_ctx_raw [ctx]; exact_fn(grid, row)->[G];
        y_all [R] for grid range. Returns list of per-query dicts."""
        n_act = xin_act.shape[1]
        xc = jnp.zeros((args.ctx, f), jnp.float32).at[:, :n_act].set(
            xin_act[: args.ctx]
        )
        fmask = col < n_act
        fitted = regressor.fit_encode(model, xc, jnp.asarray(y_ctx_raw), fmask)
        xq = jnp.zeros((args.num_qry, f), jnp.float32).at[:, :n_act].set(
            xin_act[args.ctx :]
        )
        logits = regressor.predict_logits(model, fitted, xq)
        sd = float(np.std(np.asarray(y_all))) or 1.0
        mu = float(np.mean(np.asarray(y_all)))
        grid = np.linspace(mu - 4 * sd, mu + 4 * sd, args.grid)
        dg = grid[1] - grid[0]
        _, lp = model_density(fitted, logits, grid)
        rows = []
        mu_y = float(fitted.stats.mu_y)
        sd_y = float(fitted.stats.sd_y)
        x_np = np.asarray(xin_act, np.float64)
        y_np = np.asarray(y_all, np.float64)
        sd_marg = float(np.std(y_np)) or 1.0
        for q in range(args.num_qry):
            pe = exact_fn(grid, args.ctx + q)
            pm = np.exp(lp[q] - lp[q].max())
            kl = kl_grid(pe, pm, dg)
            floor = bar_floor(pe, grid, dg, mu_y, sd_y)
            # Oracle-free kNN-KDE baseline on the same context: beatable
            # exactly when the conditional is in-context learnable.
            d = np.linalg.norm(x_np[: args.ctx] - x_np[args.ctx + q], axis=1)
            ys = y_np[np.argsort(d)[:48]]
            h = max(1.06 * float(np.std(ys)) * 48 ** -0.2, 1e-3 * sd_marg)
            zk = (grid[None, :] - ys[:, None]) / h
            kde = (np.exp(-0.5 * zk * zk) / (np.sqrt(2 * np.pi) * h)).mean(0)
            # Held-out NLL at the TRUE query draw: meaningful even when the
            # exact target is irreducible (nll_exact is the floor given the
            # true mixture parameters).
            y_true = y_np[args.ctx + q]
            lp_norm = lp[q] - np.log(max(np.exp(lp[q]).sum() * dg, 1e-300))
            nll_model = -float(np.interp(y_true, grid, lp_norm))
            pe_n = np.maximum(pe, 0.0)
            pe_n = pe_n / max(pe_n.sum() * dg, 1e-300)
            nll_exact = -float(np.log(max(
                np.interp(y_true, grid, pe_n), 1e-300)))
            rows.append({
                "kl": kl,
                "kl_floor": floor,
                "kl_excess": kl - floor,
                "kl_knn_baseline": kl_grid(pe, kde, dg),
                "nll_model": nll_model,
                "nll_exact": nll_exact,
                "modes_exact": count_modes(grid, pe),
                "modes_model": count_modes(grid, pm),
            })
        return rows

    key0 = jax.random.PRNGKey(args.seed)
    results = {"family_c": [], "family_c_2d": [], "bimodal": [], "spike_slab": []}

    # ---- family C draws (the actual training family, exact conditionals) --
    # Probed at the training-max 8 active features AND at 2 (the benchmark-
    # like regime where the conditional is densest in context).
    pcfg_c = dataclasses.replace(
        pcfg, mm_mu_input_scale=args.mm_mu_input_scale,
        mm_sig_lo=args.mm_sig_lo,
        p_marginal_mixture=args.p_marginal_mixture,
    )
    for sec, n_act in (("family_c", n_active), ("family_c_2d", 2)):
        for t in range(args.num_tasks):
            key = jax.random.fold_in(key0, t if sec == "family_c" else 777 + t)
            xin = jax.random.normal(jax.random.fold_in(key, 1), (R, n_act))
            y, (mu_k, sig_k, wlog) = prior._family_c(
                jax.random.fold_in(key, 2), pcfg_c, xin
            )
            w_all = np.asarray(jax.nn.softmax(wlog, axis=-1))
            mu_all = np.asarray(mu_k)
            sig_all = np.asarray(sig_k)

            def exact_fn(grid, row, mu_all=mu_all, sig_all=sig_all, w_all=w_all):
                return mixture_density(grid, mu_all[row], sig_all, w_all[row])

            results[sec].extend(
                score_task(xin, np.asarray(y)[: args.ctx], exact_fn, np.asarray(y))
            )

    # ---- canonical shapes: x-independent, so ctx y ~ the mixture itself ---
    def canonical(name, mus, sigs, ws, t_seed):
        key = jax.random.fold_in(key0, 10_000 + t_seed)
        xin = jax.random.normal(jax.random.fold_in(key, 1), (R, n_active))
        comp = jax.random.choice(
            jax.random.fold_in(key, 2), len(ws), (R,), p=jnp.asarray(ws)
        )
        eps = jax.random.normal(jax.random.fold_in(key, 3), (R,))
        y = jnp.asarray(mus)[comp] + jnp.asarray(sigs)[comp] * eps

        def exact_fn(grid, row):
            return mixture_density(
                grid, np.asarray(mus, np.float64), np.asarray(sigs, np.float64),
                np.asarray(ws, np.float64),
            )

        results[name].extend(
            score_task(xin, np.asarray(y)[: args.ctx], exact_fn, np.asarray(y))
        )

    for t in range(8):
        canonical("bimodal", [-0.9, 0.9], [0.06, 0.06], [0.5, 0.5], t)
        canonical("spike_slab", [0.0, 0.0], [0.05, 0.5], [0.5, 0.5], 100 + t)

    def summarize(rows):
        kl = np.array([r["kl"] for r in rows])
        exc = np.array([r.get("kl_excess", r["kl"]) for r in rows])
        knn = np.array([r["kl_knn_baseline"] for r in rows])
        gap = np.array([r["nll_model"] - r["nll_exact"] for r in rows])
        me = np.array([r["modes_exact"] for r in rows])
        mm = np.array([r["modes_model"] for r in rows])
        multi = me >= 2
        return {
            "n": len(rows),
            "kl_mean": float(kl.mean()),
            "kl_median": float(np.median(kl)),
            "kl_excess_mean": float(exc.mean()),
            "kl_excess_median": float(np.median(exc)),
            "kl_knn_baseline_mean": float(knn.mean()),
            "frac_beats_knn": float((kl < knn).mean()),
            "nll_gap_mean": float(gap.mean()),
            "nll_gap_median": float(np.median(gap)),
            "frac_mode_count_correct": float((me == mm).mean()),
            "frac_multimodal_recovered": (
                float((mm[multi] >= 2).mean()) if multi.any() else None
            ),
        }

    out = {
        "ts": time.time(),
        "ckpt": str(ckpt_name),
        "ctx": args.ctx,
        "num_tasks": args.num_tasks,
        "seed": args.seed,
        "mm_mu_input_scale": args.mm_mu_input_scale,
        "mm_sig_lo": args.mm_sig_lo,
        "p_marginal_mixture": args.p_marginal_mixture,
        **{k: summarize(v) for k, v in results.items()},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
