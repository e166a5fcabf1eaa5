#!/usr/bin/env python
"""Diagnose the multimodal posterior-quality plateau (VERDICT r3 item 1).

Three rounds of scaling (1.88M -> 9.07M params) left two-moons C2ST at
~0.85 and gaussian_mixture flat at ~0.72 across num_cal 10 -> 1000, while
unimodal tasks sit at ~0.5. This script runs the controlled experiments
that localize WHY, instead of scaling on faith:

  model-conditionals   Per-AR-step conditional densities of the shipped
                       checkpoint vs the EXACT conditionals on two_moons /
                       gaussian_mixture (both have closed-form likelihoods,
                       tasks/registry.py), plus the bar-head projection of
                       the exact conditional — separating "the head cannot
                       represent it" (projection KL large) from "the model
                       never learned it" (projection KL ~ 0, model KL large).

  prior-audit          What conditional SHAPES the pretraining prior
                       (pretrain/prior.py _sample_one) actually produces:
                       for each synthetic task, Monte-Carlo p(y|x*) at a
                       fixed query row — family A by resampling the latent z,
                       family B by SNIS posterior inference on the random
                       simulator — and measure width / number of modes /
                       separation in MARGINAL-SD units (the units the
                       z-scored bar head sees at inference). Compared
                       against what two_moons step 2 and gaussian_mixture
                       demand.

Everything runs on CPU (run with JAX_PLATFORMS=cpu and PYTHONPATH without
/root/.axon_site). Results -> results/diagnosis_*.json (+ .npz curves).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ---------------------------------------------------------------------------
# Shared density utilities (numpy; inputs are grids + densities)
# ---------------------------------------------------------------------------


def normalize_grid_density(p, dg):
    p = np.maximum(np.asarray(p, np.float64), 0.0)
    z = p.sum() * dg
    return p / max(z, 1e-300)


def kl_grid(p, q, dg, eps=1e-12):
    """KL(p || q) on a shared grid, both normalized."""
    p = normalize_grid_density(p, dg)
    q = normalize_grid_density(q, dg)
    mask = p > eps
    return float(np.sum(p[mask] * (np.log(p[mask]) - np.log(np.maximum(q[mask], eps))) * dg))


def entropy_grid(p, dg, eps=1e-300):
    p = normalize_grid_density(p, dg)
    mask = p > 0
    return float(-np.sum(p[mask] * np.log(np.maximum(p[mask], eps)) * dg))


def tv_grid(p, q, dg):
    p = normalize_grid_density(p, dg)
    q = normalize_grid_density(q, dg)
    return float(0.5 * np.sum(np.abs(p - q) * dg))


def find_modes(grid, p, prominence_frac=0.12):
    """Local maxima of p with prominence >= prominence_frac * max(p).
    Returns list of dicts {loc, height, fwhm} sorted by height desc."""
    p = np.asarray(p, np.float64)
    n = len(p)
    pmax = p.max()
    if pmax <= 0:
        return []
    peaks = []
    for i in range(1, n - 1):
        if p[i] >= p[i - 1] and p[i] > p[i + 1]:
            # prominence: drop to the higher of the two bracketing valleys
            # before a taller point is reached.
            lo = p[:i][::-1]
            hi = p[i + 1:]
            lv = p[i]
            for v in lo:
                if v > p[i]:
                    break
                lv = min(lv, v)
            rv = p[i]
            for v in hi:
                if v > p[i]:
                    break
                rv = min(rv, v)
            prom = p[i] - max(lv, rv)
            if prom >= prominence_frac * pmax:
                # FWHM around the peak
                half = p[i] / 2.0
                l = i
                while l > 0 and p[l] > half:
                    l -= 1
                r = i
                while r < n - 1 and p[r] > half:
                    r += 1
                peaks.append(
                    {
                        "loc": float(grid[i]),
                        "height": float(p[i]),
                        "fwhm": float(grid[r] - grid[l]),
                    }
                )
    peaks.sort(key=lambda m: -m["height"])
    return peaks


def mode_summary(grid, p):
    modes = find_modes(grid, p)
    out = {"n_modes": len(modes), "modes": modes[:4]}
    if len(modes) >= 2:
        out["top2_separation"] = abs(modes[0]["loc"] - modes[1]["loc"])
        out["min_fwhm_top2"] = min(modes[0]["fwhm"], modes[1]["fwhm"])
    return out


def hpd_mass(grid, p_exact, p_model, frac=0.9):
    """Mass the model assigns to the exact density's `frac` HPD region."""
    dg = grid[1] - grid[0]
    p = normalize_grid_density(p_exact, dg)
    q = normalize_grid_density(p_model, dg)
    order = np.argsort(-p)
    csum = np.cumsum(p[order] * dg)
    k = int(np.searchsorted(csum, frac)) + 1
    region = order[:k]
    return float(np.sum(q[region] * dg))


# ---------------------------------------------------------------------------
# model-conditionals
# ---------------------------------------------------------------------------


def run_model_conditionals(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from npe_pfn_tpu import NPEPFN
    from npe_pfn_tpu.models import bar_distribution as bar
    from npe_pfn_tpu.models import checkpoint as ckpt_mod
    from npe_pfn_tpu.models import regressor
    from npe_pfn_tpu.tasks.registry import (
        _gaussian_mixture_log_likelihood,
        _two_moons_log_likelihood,
        get_task,
    )

    if getattr(args, "ckpt", None):
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
    print(f"[diag] checkpoint: {ckpt_name}", flush=True)

    TASKS = {
        "two_moons": {
            "loglik": _two_moons_log_likelihood,
            "box": (-1.0, 1.0),
        },
        "gaussian_mixture": {
            "loglik": _gaussian_mixture_log_likelihood,
            "box": (-10.0, 10.0),
        },
    }

    G = args.grid
    report = {}
    curves = {}

    for name in args.tasks:
        spec = TASKS[name]
        task = get_task(name)
        rng = jax.random.PRNGKey(0)
        theta, x = task.simulate(rng, args.num_sims)
        x_o = x[0]
        est = NPEPFN(
            prior=task.prior, model=model,
            filter_context_size=args.context, qry_chunk=256,
        )
        est.append_simulations(theta, x)
        theta_ctx, x_ctx, ctx_mask = est.get_context(x_o, rng=jax.random.PRNGKey(7))
        n, dth = theta_ctx.shape
        dx = x_ctx.shape[1]
        f = model.cfg.max_features

        lo, hi = spec["box"]
        grid = np.linspace(lo, hi, G)
        dg = grid[1] - grid[0]

        # ---- exact joint on a 2D grid -> marginals / conditionals ---------
        tt = np.stack(np.meshgrid(grid, grid, indexing="ij"), axis=-1).reshape(-1, 2)
        logp = np.asarray(spec["loglik"](jnp.asarray(tt), x_o), np.float64).reshape(G, G)
        logp -= logp.max()
        joint = np.exp(logp)
        joint /= joint.sum() * dg * dg
        exact_m0 = joint.sum(axis=1) * dg  # p(theta0 | x)

        # ---- model conditionals, mirroring autoregressive_sample's step ---
        xc = jnp.zeros((n, f), jnp.float32)
        xc = xc.at[:, :dx].set(x_ctx).at[:, dx : dx + dth].set(theta_ctx)
        col = jnp.arange(f)

        def model_conditional_curve(i, theta_prefix_vals):
            """Density over `grid` of p(theta_i | x_o, theta_<i = prefix).
            theta_prefix_vals: [P, i] array of prefixes; returns [P, G]."""
            feat_mask = col < dx + i
            y_raw = theta_ctx[:, i]
            fitted = regressor.fit_encode(model, xc, y_raw, feat_mask, ctx_mask)
            P = theta_prefix_vals.shape[0]
            xq = jnp.zeros((P, f), jnp.float32)
            xq = xq.at[:, :dx].set(jnp.broadcast_to(x_o, (P, dx)))
            if i > 0:
                xq = xq.at[:, dx : dx + i].set(theta_prefix_vals)
            logits = regressor.predict_logits(model, fitted, xq)  # [P, B]
            zg = (jnp.asarray(grid) - fitted.stats.mu_y) / fitted.stats.sd_y
            lp = jax.vmap(
                lambda lg: bar.log_prob(model.borders, lg, zg)
            )(logits) - jnp.log(fitted.stats.sd_y)
            return np.asarray(lp, np.float64), fitted

        lp0, fitted0 = model_conditional_curve(0, jnp.zeros((1, 0)))
        model_m0 = np.exp(lp0[0] - lp0[0].max())

        # ---- bar-head representation ceiling for this conditional ---------
        # Project the exact conditional onto the head's bins (exact bin
        # masses, uniform within bins) in the SAME normalized space the
        # model predicts in; its KL to the exact curve is the best any
        # logits could do.
        def bar_projection(p_exact, mu_y, sd_y):
            borders = np.asarray(model.borders, np.float64) * sd_y + mu_y
            pe = normalize_grid_density(p_exact, dg)
            cdf = np.concatenate([[0.0], np.cumsum(pe) * dg])
            cdf_at = np.interp(borders, grid, cdf[1:], left=0.0, right=1.0)
            mass = np.diff(cdf_at)
            widths = np.diff(borders)
            dens_bins = mass / np.maximum(widths, 1e-12)
            k = np.clip(np.searchsorted(borders[1:-1], grid, side="right"), 0, len(mass) - 1)
            return dens_bins[k]

        mu0 = float(fitted0.stats.mu_y)
        sd0 = float(fitted0.stats.sd_y)
        proj_m0 = bar_projection(exact_m0, mu0, sd0)

        entry = {
            "context_rows": int(n),
            "num_sims": args.num_sims,
            "y_stats_step0": {"mu": mu0, "sd": sd0},
            "step0": {
                "kl_exact_model": kl_grid(exact_m0, model_m0, dg),
                "kl_exact_barproj": kl_grid(exact_m0, proj_m0, dg),
                "tv_exact_model": tv_grid(exact_m0, model_m0, dg),
                "entropy_exact": entropy_grid(exact_m0, dg),
                "entropy_model": entropy_grid(model_m0, dg),
                "hpd90_mass_model": hpd_mass(grid, exact_m0, model_m0),
                "modes_exact": mode_summary(grid, normalize_grid_density(exact_m0, dg)),
                "modes_model": mode_summary(grid, normalize_grid_density(model_m0, dg)),
            },
            "step1": [],
        }
        curve_store = {
            "grid": grid,
            "exact_m0": normalize_grid_density(exact_m0, dg),
            "model_m0": normalize_grid_density(model_m0, dg),
            "barproj_m0": normalize_grid_density(proj_m0, dg),
        }

        # ---- step 2: p(theta1 | theta0*, x_o) at informative theta0* ------
        exact_modes0 = find_modes(grid, exact_m0)
        t0_stars = [m["loc"] for m in exact_modes0[:2]]
        cdf0 = np.cumsum(normalize_grid_density(exact_m0, dg)) * dg
        for q in (0.25, 0.75):
            t0_stars.append(float(grid[np.searchsorted(cdf0, q)]))
        t0_stars = sorted(set(round(t, 6) for t in t0_stars))

        prefixes = jnp.asarray(np.array(t0_stars, np.float32)[:, None])
        lp1, fitted1 = model_conditional_curve(1, prefixes)
        mu1, sd1 = float(fitted1.stats.mu_y), float(fitted1.stats.sd_y)
        for pi, t0s in enumerate(t0_stars):
            i0 = int(np.clip(np.searchsorted(grid, t0s), 0, G - 1))
            exact_c = joint[i0, :]
            if exact_c.sum() * dg < 1e-12:
                continue
            model_c = np.exp(lp1[pi] - lp1[pi].max())
            proj_c = bar_projection(exact_c, mu1, sd1)
            entry["step1"].append(
                {
                    "theta0_star": t0s,
                    "exact_m0_at_star": float(normalize_grid_density(exact_m0, dg)[i0]),
                    "kl_exact_model": kl_grid(exact_c, model_c, dg),
                    "kl_exact_barproj": kl_grid(exact_c, proj_c, dg),
                    "tv_exact_model": tv_grid(exact_c, model_c, dg),
                    "entropy_exact": entropy_grid(exact_c, dg),
                    "entropy_model": entropy_grid(model_c, dg),
                    "hpd90_mass_model": hpd_mass(grid, exact_c, model_c),
                    "modes_exact": mode_summary(grid, normalize_grid_density(exact_c, dg)),
                    "modes_model": mode_summary(grid, normalize_grid_density(model_c, dg)),
                }
            )
            curve_store[f"exact_c_{pi}"] = normalize_grid_density(exact_c, dg)
            curve_store[f"model_c_{pi}"] = normalize_grid_density(model_c, dg)
            curve_store[f"barproj_c_{pi}"] = normalize_grid_density(proj_c, dg)
        curve_store["t0_stars"] = np.array(t0_stars)

        # ---- full 2D model density (step0 x step1 over the grid) ----------
        sub = max(1, G // args.grid2d)
        g2 = grid[::sub]
        pref2 = jnp.asarray(np.array(g2, np.float32)[:, None])
        lp1_all, _ = model_conditional_curve(1, pref2)
        lp1_all = lp1_all[:, ::sub]  # [G2 (theta0), G2 (theta1)]
        lp0_sub = lp0[0][::sub]
        model_2d = np.exp(
            (lp0_sub[:, None] + lp1_all)
            - (lp0_sub[:, None] + lp1_all).max()
        )
        joint_sub = joint[::sub, ::sub]
        dg2 = g2[1] - g2[0]
        m2 = normalize_grid_density(model_2d.reshape(-1), dg2 * dg2).reshape(model_2d.shape)
        j2 = normalize_grid_density(joint_sub.reshape(-1), dg2 * dg2).reshape(joint_sub.shape)
        entry["joint2d"] = {
            "kl_exact_model": kl_grid(joint_sub.reshape(-1), model_2d.reshape(-1), dg2 * dg2),
            "tv_exact_model": tv_grid(joint_sub.reshape(-1), model_2d.reshape(-1), dg2 * dg2),
            "hpd90_mass_model": hpd_mass(
                np.arange(j2.size), j2.reshape(-1), m2.reshape(-1), 0.9
            ),
        }
        curve_store["grid2d"] = g2
        curve_store["exact_2d"] = j2
        curve_store["model_2d"] = m2

        report[name] = entry
        curves[name] = curve_store
        print(f"[diag] {name}: step0 KL={entry['step0']['kl_exact_model']:.3f} "
              f"(bar ceiling {entry['step0']['kl_exact_barproj']:.4f}), "
              f"modes exact={entry['step0']['modes_exact']['n_modes']} "
              f"model={entry['step0']['modes_model']['n_modes']}", flush=True)
        for s in entry["step1"]:
            print(f"  step1 @ t0={s['theta0_star']:+.3f}: KL={s['kl_exact_model']:.3f} "
                  f"(ceiling {s['kl_exact_barproj']:.4f}) modes "
                  f"exact={s['modes_exact']['n_modes']} model={s['modes_model']['n_modes']} "
                  f"hpd90_mass={s['hpd90_mass_model']:.3f}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    np.savez_compressed(args.out.replace(".json", ".npz"),
                        **{f"{t}/{k}": v for t, cs in curves.items() for k, v in cs.items()})
    print(f"[diag] wrote {args.out}")


# ---------------------------------------------------------------------------
# prior-audit
# ---------------------------------------------------------------------------


def run_prior_audit(args):
    import jax
    import jax.numpy as jnp

    from npe_pfn_tpu.pretrain import prior as prior_mod

    cfg = prior_mod.PriorConfig(
        p_heteroscedastic=0.3, p_heavy_tail=0.2, p_categorical_feats=0.2
    )  # the v4 recipe's enrichment (scripts/pretrain_v4.sh)

    # ---- family A: p(y|x*) by resampling the latent z ----------------------
    # Mirrors pretrain/prior.py _sample_one lines 112-163 with the SAME key
    # indices so the audited distribution is exactly the training one.
    def family_a(rng, zkey):
        R, F = cfg.num_ctx + cfg.num_qry, cfg.num_features
        ks = jax.random.split(rng, 24)
        u_f = jax.random.uniform(ks[0], ())
        f_active = 1 + jnp.floor(u_f**1.5 * (cfg.max_active_features - 1)).astype(jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
        feat_mask = col < f_active
        x_raw = jax.random.normal(ks[2], (R, F))
        mix_w = jax.random.normal(ks[3], (F, F)) / jnp.sqrt(F)
        alpha = jax.random.uniform(ks[4], ())
        x_fwd = x_raw * (1 - alpha) + (x_raw @ mix_w) * alpha
        uniformize = jax.random.bernoulli(ks[5], 0.3, (F,))
        x_fwd = jnp.where(uniformize, jax.scipy.stats.norm.cdf(x_fwd) * 2 - 1, x_fwd)
        if cfg.p_heavy_tail > 0:
            k_ht1, k_ht2 = jax.random.split(jax.random.fold_in(ks[5], 1))
            heavy = jax.random.bernoulli(k_ht1, cfg.p_heavy_tail, (F,))
            mix = 1.0 / jnp.sqrt(jax.random.gamma(k_ht2, 2.0, (R, F)) / 2.0 + 1e-3)
            x_fwd = jnp.where(heavy, x_fwd * mix, x_fwd)
        if cfg.p_categorical_feats > 0:
            k_c1, k_c2 = jax.random.split(jax.random.fold_in(ks[5], 2))
            cat = jax.random.bernoulli(k_c1, cfg.p_categorical_feats, (F,))
            n_levels = jax.random.randint(k_c2, (F,), 2, 8).astype(jnp.float32)
            x_quant = jnp.round(jax.scipy.stats.norm.cdf(x_fwd) * n_levels - 0.5)
            x_fwd = jnp.where(cat, x_quant, x_fwd)
        z = jax.random.normal(ks[6], (R, cfg.latent_dim))
        z_scale = jax.random.uniform(ks[7], (), minval=0.0, maxval=1.5)
        g_in = jnp.concatenate([x_fwd * feat_mask, z * z_scale], axis=-1)
        y_fwd = prior_mod._random_mlp(ks[8], g_in, 1, cfg.hidden)[:, 0]
        sd_y = jnp.maximum(jnp.std(y_fwd), 1e-6)
        noise_scale = 10.0 ** jax.random.uniform(ks[9], (), minval=-3.0, maxval=-0.3)
        # conditional draws at query row x* = row num_ctx (first query row):
        xstar = (x_fwd * feat_mask)[cfg.num_ctx]
        kz, kn = jax.random.split(zkey)
        z_new = jax.random.normal(kz, (args.z_draws, cfg.latent_dim)) * z_scale
        g_in_c = jnp.concatenate(
            [jnp.broadcast_to(xstar, (args.z_draws, F)), z_new], axis=-1
        )
        y_cond = prior_mod._random_mlp(ks[8], g_in_c, 1, cfg.hidden)[:, 0]
        noise = jax.random.normal(kn, (args.z_draws,)) * noise_scale * sd_y
        if cfg.p_heteroscedastic > 0:
            k_h1, k_h2 = jax.random.split(jax.random.fold_in(ks[9], 1))
            het = jax.random.bernoulli(k_h1, cfg.p_heteroscedastic)
            gate = jax.nn.sigmoid(
                prior_mod._random_mlp(k_h2, xstar[None], 1, cfg.hidden)[0, 0]
            )
            noise = jnp.where(het, noise * 2.0 * gate, noise)
        y_cond = y_cond + noise
        # marginal y (with noise) for the normalization scale:
        y_marg = y_fwd + jax.random.normal(ks[10], (R,)) * noise_scale * sd_y
        return y_cond, y_marg

    # ---- family B: p(theta_j | x*, theta_<j*) by SNIS ----------------------
    # Mirrors _sample_one lines 165-183.
    def family_b(rng, pkey):
        R, F = cfg.num_ctx + cfg.num_qry, cfg.num_features
        ks = jax.random.split(rng, 24)
        u_f = jax.random.uniform(ks[0], ())
        f_active = 1 + jnp.floor(u_f**1.5 * (cfg.max_active_features - 1)).astype(jnp.int32)
        dth = cfg.max_theta_dim
        theta = jax.random.normal(ks[11], (R, dth))
        j = jax.random.randint(ks[12], (), 0, dth)
        n_sim_feats = jnp.maximum(f_active - j, 1)
        x_sim = prior_mod._random_mlp(ks[13], theta, F, cfg.hidden)
        sim_noise = 10.0 ** jax.random.uniform(ks[14], (), minval=-3.0, maxval=-0.5)
        sd_sim = jnp.maximum(jnp.std(x_sim), 1e-6)
        noise_sd = sim_noise * sd_sim
        x_obs = x_sim + jax.random.normal(ks[15], (R, F)) * noise_sd
        # target row: first query row's observed sim features + theta prefix
        row = cfg.num_ctx
        theta_star, x_star = theta[row], x_obs[row]
        # SNIS: theta_<j fixed to theta_star, theta_>=j ~ N(0, I) proposals
        # (= the prior, so weights are pure likelihoods).
        M = args.snis_draws
        prop = jax.random.normal(pkey, (M, dth))
        col_d = jnp.arange(dth)
        th_prop = jnp.where(col_d[None, :] < j, theta_star[None, :], prop)
        sim_out = prior_mod._random_mlp(ks[13], th_prop, F, cfg.hidden)
        colF = jnp.arange(F)
        live = colF[None, :] < n_sim_feats
        loglik = -0.5 * jnp.sum(
            jnp.where(live, ((x_star[None, :] - sim_out) / noise_sd) ** 2, 0.0),
            axis=1,
        )
        w = jax.nn.softmax(loglik)
        ess = 1.0 / jnp.sum(w**2)
        y_cond = th_prop[:, j]
        y_marg = theta[:, j]
        return y_cond, w, ess, y_marg, j

    def cond_metrics(y_cond, weights, y_marg):
        y_cond = np.asarray(y_cond, np.float64)
        y_marg = np.asarray(y_marg, np.float64)
        sd_marg = max(y_marg.std(), 1e-9)
        mu_marg = y_marg.mean()
        zc = (y_cond - mu_marg) / sd_marg  # inference z-units
        if weights is None:
            weights = np.full(len(zc), 1.0 / len(zc))
        else:
            weights = np.asarray(weights, np.float64)
            weights = weights / weights.sum()
        m = float(np.sum(weights * zc))
        sd_c = float(np.sqrt(max(np.sum(weights * (zc - m) ** 2), 1e-18)))
        m4 = float(np.sum(weights * (zc - m) ** 4))
        kurt = m4 / max(sd_c**4, 1e-18)
        # weighted KDE on a grid spanning the conditional support
        lo, hi = m - 6 * sd_c, m + 6 * sd_c
        G = 1024
        grid = np.linspace(lo, hi, G)
        bw = max(0.2 * sd_c, (hi - lo) / G * 2.0)
        # subsample for the KDE cost
        if len(zc) > 4000:
            idx = np.random.default_rng(0).choice(len(zc), 4000, p=weights)
            kde_pts, kde_w = zc[idx], np.full(4000, 1.0 / 4000)
        else:
            kde_pts, kde_w = zc, weights
        d2 = (grid[None, :] - kde_pts[:, None]) / bw
        p = (kde_w[:, None] * np.exp(-0.5 * d2**2)).sum(0) / (bw * np.sqrt(2 * np.pi))
        ms = mode_summary(grid, p)
        out = {
            "cond_sd_z": sd_c,
            "kurtosis": kurt,
            "n_modes": ms["n_modes"],
        }
        if "top2_separation" in ms:
            out["top2_separation_z"] = ms["top2_separation"]
            out["min_fwhm_top2_z"] = ms["min_fwhm_top2"]
            hs = [mm["height"] for mm in ms["modes"][:2]]
            out["mode_balance"] = min(hs) / max(hs)
        return out

    rng0 = jax.random.PRNGKey(args.seed)
    fa = jax.jit(family_a)
    fb = jax.jit(family_b)

    rows_a, rows_b = [], []
    for t in range(args.num_tasks):
        key = jax.random.fold_in(rng0, t)
        ka, kb = jax.random.split(key)
        y_c, y_m = fa(key, ka)
        rows_a.append(cond_metrics(y_c, None, y_m))
        y_c, w, ess, y_m, j = fb(key, kb)
        mb = cond_metrics(y_c, w, y_m)
        mb["ess"] = float(ess)
        mb["j"] = int(j)
        rows_b.append(mb)
        if (t + 1) % 50 == 0:
            print(f"[audit] {t + 1}/{args.num_tasks}", flush=True)

    def summarize(rows, ess_min=None):
        if ess_min is not None:
            kept = [r for r in rows if r["ess"] >= ess_min]
        else:
            kept = rows
        n = len(kept)
        multi = [r for r in kept if r["n_modes"] >= 2]
        sep = [
            r for r in multi
            if r.get("top2_separation_z", 0) > 3 * r.get("min_fwhm_top2_z", 1e9)
            and r.get("mode_balance", 0) > 0.2
        ]
        thin_sep = [r for r in sep if r.get("min_fwhm_top2_z", 1e9) < 0.15]
        widths = np.array([r["cond_sd_z"] for r in kept])
        return {
            "n": n,
            "n_dropped_low_ess": len(rows) - n,
            "frac_multimodal_detected": len(multi) / max(n, 1),
            "frac_separated": len(sep) / max(n, 1),
            "frac_thin_separated": len(thin_sep) / max(n, 1),
            "frac_scale_mixture_kurt>6": sum(r["kurtosis"] > 6 for r in kept) / max(n, 1),
            "cond_sd_z_quantiles": {
                q: float(np.quantile(widths, q)) for q in (0.05, 0.25, 0.5, 0.75, 0.95)
            },
            "frac_cond_sd_below_0.05z": float(np.mean(widths < 0.05)),
        }

    report = {
        "config": {
            "num_tasks": args.num_tasks,
            "z_draws": args.z_draws,
            "snis_draws": args.snis_draws,
            "prior_cfg": "v4 recipe (p_het 0.3, p_heavy 0.2, p_cat 0.2)",
        },
        # What the benchmark tasks demand of a conditional (measured in the
        # same marginal-sd z-units by the model-conditionals probe):
        "requirements": {
            "two_moons_step1": "2 modes, sep ~1.5-2.5z, fwhm ~0.02-0.06z",
            "gaussian_mixture": "scale mixture: spike fwhm ~0.04z over slab ~0.4z (kurt ~15)",
        },
        "family_A_forward": summarize(rows_a),
        "family_B_inverse": summarize(rows_b, ess_min=args.ess_min),
        "family_B_all_ess": summarize(rows_b),
    }
    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k.startswith("family")}, indent=2))
    print(f"[audit] wrote {args.out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    mc = sub.add_parser("model-conditionals")
    mc.add_argument("--ckpt", default=None,
                    help="checkpoint path (default: checkpoints/DEFAULT) — "
                    "lets the probe track live-training snapshots")
    mc.add_argument("--tasks", nargs="+", default=["two_moons", "gaussian_mixture"])
    mc.add_argument("--num_sims", type=int, default=10_000)
    mc.add_argument("--context", type=int, default=2048)
    mc.add_argument("--grid", type=int, default=1024)
    mc.add_argument("--grid2d", type=int, default=128)
    mc.add_argument("--out", default="results/diagnosis_model_conditionals.json")

    pa = sub.add_parser("prior-audit")
    pa.add_argument("--num_tasks", type=int, default=300)
    pa.add_argument("--z_draws", type=int, default=4000)
    pa.add_argument("--snis_draws", type=int, default=50_000)
    pa.add_argument("--ess_min", type=float, default=80.0)
    pa.add_argument("--seed", type=int, default=0)
    pa.add_argument("--out", default="results/diagnosis_prior_audit.json")

    args = ap.parse_args()
    if args.cmd == "model-conditionals":
        run_model_conditionals(args)
    else:
        run_prior_audit(args)


if __name__ == "__main__":
    main()
