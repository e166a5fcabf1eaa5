"""Synthetic task prior for pretraining TabICA.

The reference relies on TabPFNv2's pretrained weights (an external artifact
it downloads at runtime; reference pyproject.toml:15). No checkpoint or
network access exists in this environment, so the framework pretrains its own
prior-fitted network — once, offline, on TPU — preserving the reference's
"no training at inference" contract (reference README.md:36).

The prior is a mixture of three task families, all generated on-device inside
jit with static shapes:

1. **Stochastic-conditional regression** ("forward"): y = g(x, z) + noise for
   a random sparse MLP g and latent z ~ N(0, I). The latent makes p(y|x)
   non-degenerate and frequently multimodal — exactly what a posterior
   p(θ_i | x, θ_{<i}) looks like for non-injective simulators (two moons!).
2. **SBI inverse problems** ("inverse"): θ ~ N(0, I), x = s(θ) + noise for a
   random simulator s; the table's features are (x dims, θ_{<j}) and the
   target is θ_j — the literal structure of autoregressive NPE-PFN sampling
   (reference npe_pfn.py:135-162 conditions dim j on x and θ_{<j}).
3. **Thresholded binary tasks**: y = 1[g(x, z) > t] — calibrates the
   posterior-mean classifier used by the ratio-based log_prob path and the
   restricted prior (reference npe_pfn.py:697-702).

Everything is vmapped over the dataset axis; one `sample_tasks` call is one
fully-formed training batch living in HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    num_features: int = 32        # static feature width F (mask selects active)
    num_ctx: int = 384            # static context slots per dataset
    num_qry: int = 128            # query rows per dataset
    max_active_features: int = 24
    min_ctx: int = 8
    hidden: int = 64              # random-MLP width
    max_theta_dim: int = 6        # for inverse problems
    latent_dim: int = 4           # z dim for stochastic conditionals
    p_inverse: float = 0.4        # mixture weights
    p_binary: float = 0.15
    # v2 enrichment knobs (defaults = v1 behavior for resume compatibility):
    p_heteroscedastic: float = 0.0    # input-dependent noise scale
    p_heavy_tail: float = 0.0         # student-t-ish feature marginals
    p_categorical_feats: float = 0.0  # quantize a random subset of features
    # v5 conditional-shape enrichment (round-4 diagnosis: the benchmark
    # posteriors the model fails — two_moons, gaussian_mixture, SLCP — are
    # thin separated multimodal or spike+slab scale-mixture conditionals,
    # shapes families A/B rarely produce; results/diagnosis_*.json):
    p_multimodal: float = 0.0         # family C: explicit K-component
                                      # mixture conditionals p(y|x) with
                                      # x-dependent means/weights and
                                      # per-component scales (spike+slab
                                      # when means collapse)
    p_sym_fold: float = 0.0           # family B variant: element-wise |.|
                                      # fold on a random subset of theta
                                      # dims before the simulator — the
                                      # exact sign-symmetry mechanism that
                                      # makes two_moons bimodal
                                      # (tasks/registry.py:60 |t0+t1|)
    max_mixture_components: int = 4   # K range for family C (2..K)
    # v6 learnability knobs (round-4 addendum, results/DIAGNOSIS.md): with
    # unit-scale MLP mean fields and sigma down to 10^-2.5, family-C exact
    # conditionals are Bayes-unlearnable from <=768 context rows (a kNN-KDE
    # oracle-free estimator scores KL ~2.4 — WORSE than the v4/v5 models'
    # ~2.2), so the loss pushes the model to hedge instead of sharpen.
    # Defaults reproduce the v5 stream byte-for-byte.
    mm_mu_input_scale: float = 1.0    # scale x before the family-C mu / w
                                      # MLPs: <1 makes mode locations vary
                                      # smoothly with x (learnable in
                                      # context, like two_moons' crescents)
    mm_sig_lo: float = -2.5           # log10 lower bound of family-C
                                      # component scales; -1.7 (~0.02z)
                                      # keeps thin modes resolvable from
                                      # ~500-row context neighborhoods
    # v7 spike+slab knob (VERDICT r4 item 3): probability that a family-C
    # task is a pure MARGINAL mixture — y independent of x (row-constant
    # means and weights). The learnability rows show frac_beats_knn = 0.0
    # on the canonical spike+slab even for a tiny model trained purely on
    # family C (results/learnability_family_c.jsonl): with x-dependent mean
    # and weight fields the model learns to attribute residual y-variation
    # to x and hedges, so it never learns plain in-context density
    # estimation. An x-independent branch removes that excuse. Within the
    # branch the mean-collapse probability rises to 0.5, so thin+broad
    # components at a SHARED mean — the exact spike+slab shape
    # (gaussian_mixture's posterior, scripts/probe_family_c.py:266) —
    # appear often. Default 0 reproduces the v5/v6 streams byte-for-byte.
    p_marginal_mixture: float = 0.0


@dataclasses.dataclass
class TaskBatch:
    x_ctx: jnp.ndarray   # [D, N, F]
    y_ctx: jnp.ndarray   # [D, N]
    x_qry: jnp.ndarray   # [D, Q, F]
    y_qry: jnp.ndarray   # [D, Q]
    feat_mask: jnp.ndarray  # [D, F] bool
    ctx_mask: jnp.ndarray   # [D, N] bool


jax.tree_util.register_pytree_node(
    TaskBatch,
    lambda t: ((t.x_ctx, t.y_ctx, t.x_qry, t.y_qry, t.feat_mask, t.ctx_mask), None),
    lambda _, c: TaskBatch(*c),
)


def _rand_act(rng, h):
    """Random activation: mixture over tanh/relu/sin/identity per layer."""
    idx = jax.random.randint(rng, (), 0, 4)
    return jax.lax.switch(
        idx,
        [jnp.tanh, jax.nn.relu, jnp.sin, lambda v: v],
        h,
    )


def _random_mlp(rng, x, out_dim: int, hidden: int):
    """Apply a per-dataset random sparse 2-hidden-layer MLP: [R, Din] -> [R, out_dim]."""
    din = x.shape[-1]
    ks = jax.random.split(rng, 10)
    scale1 = jax.random.uniform(ks[0], (), minval=0.5, maxval=2.5)
    w1 = jax.random.normal(ks[1], (din, hidden)) * scale1 / jnp.sqrt(din)
    # Sparse dependency graph (SCM flavor): drop connections at random rate.
    keep = jax.random.bernoulli(
        ks[2], 1.0 - 0.7 * jax.random.uniform(ks[3], ()), (din, hidden)
    )
    w1 = w1 * keep
    b1 = jax.random.normal(ks[4], (hidden,)) * 0.3
    h = _rand_act(ks[5], x @ w1 + b1)
    w2 = jax.random.normal(ks[6], (hidden, hidden)) * (1.0 / jnp.sqrt(hidden))
    b2 = jax.random.normal(ks[7], (hidden,)) * 0.3
    h = _rand_act(ks[8], h @ w2 + b2)
    w3 = jax.random.normal(ks[9], (hidden, out_dim)) * (1.0 / jnp.sqrt(hidden))
    return h @ w3


def _family_c(rng: jax.Array, cfg: PriorConfig, xin: jnp.ndarray):
    """Family C: explicit K-component mixture conditional p(y|x).

    p(y|x) = sum_k w_k(x) N(y; mu_k(x), sigma_k^2) with x-dependent means
    (random MLP heads, standardized across rows so separation is in
    marginal-sd units), independent log-uniform per-component scales (thin
    spikes to broad slabs), a 0.3-probability mean collapse (pure scale
    mixture — gaussian_mixture's posterior shape), and 0.5-probability
    x-dependent weights (mode birth/death along x — crescent endpoints).

    Returns ``(y, dist)`` where ``y`` is one draw per row and ``dist`` is
    the exact conditional ``(mu [R,K], sig [K], wlog [R,K])`` — exposed so
    the capability probe and tests can score against the analytic density
    (scripts/diagnose_multimodal.py) instead of mirroring this code.
    """
    R = xin.shape[0]
    kc = jax.random.split(rng, 10)
    K = cfg.max_mixture_components
    mu_raw = _random_mlp(kc[0], xin * cfg.mm_mu_input_scale, K, cfg.hidden)  # [R, K]
    mu_sd = jnp.maximum(jnp.std(mu_raw, axis=0, keepdims=True), 1e-6)
    mu = (mu_raw - jnp.mean(mu_raw, axis=0, keepdims=True)) / mu_sd
    sep = jax.random.uniform(kc[1], (), minval=0.3, maxval=2.0)
    mu = mu * sep
    collapse = jax.random.bernoulli(kc[2], 0.3)
    mu = jnp.where(collapse, jnp.broadcast_to(mu[:, :1], mu.shape), mu)
    sig = 10.0 ** jax.random.uniform(kc[3], (K,), minval=cfg.mm_sig_lo, maxval=-0.2)
    k_live = jax.random.randint(kc[4], (), 2, K + 1)
    comp_alive = jnp.arange(K) < k_live
    wlog_x = _random_mlp(kc[5], xin * cfg.mm_mu_input_scale, K, cfg.hidden)
    temp = jax.random.uniform(kc[6], (), minval=0.5, maxval=2.0)
    use_xw = jax.random.bernoulli(kc[7], 0.5)
    wlog_g = jax.random.normal(kc[8], (K,))
    wlog = jnp.where(use_xw, wlog_x / temp, jnp.broadcast_to(wlog_g, wlog_x.shape))
    if cfg.p_marginal_mixture > 0:
        # Marginal-mixture branch: y ⊥ x. Row-constant component means at
        # the same separation scale (collapsed to a shared mean with prob
        # 0.5 — pure scale mixture / spike+slab) and row-constant weights.
        km = jax.random.split(jax.random.fold_in(rng, 99), 3)
        is_marg = jax.random.bernoulli(km[0], cfg.p_marginal_mixture)
        mu_marg = jax.random.normal(km[1], (1, K)) * sep
        collapse_m = jax.random.bernoulli(km[2], 0.5)
        mu_marg = jnp.where(collapse_m, jnp.zeros_like(mu_marg), mu_marg)
        mu = jnp.where(is_marg, jnp.broadcast_to(mu_marg, mu.shape), mu)
        wlog = jnp.where(is_marg, jnp.broadcast_to(wlog_g, wlog.shape), wlog)
    wlog = jnp.where(comp_alive, wlog, -jnp.inf)
    k_comp, k_eps = jax.random.split(kc[9])
    comp = jax.random.categorical(k_comp, wlog, axis=-1)  # [R]
    eps = jax.random.normal(k_eps, (R,))
    y = jnp.take_along_axis(mu, comp[:, None], axis=1)[:, 0] + sig[comp] * eps
    return y, (mu, sig, wlog)


def _sample_one(rng: jax.Array, cfg: PriorConfig, max_feat=None) -> Tuple[jnp.ndarray, ...]:
    """Generate one dataset with static shapes [R=N+Q rows].

    ``max_feat``: optional traced int32 overriding cfg.max_active_features —
    lets a trainer anneal task difficulty (feature-count curriculum) without
    recompiling per value.
    """
    R = cfg.num_ctx + cfg.num_qry
    F = cfg.num_features
    ks = jax.random.split(rng, 24)
    mf = cfg.max_active_features if max_feat is None else max_feat

    # --- active feature count / context size (biased toward small) ---------
    u_f = jax.random.uniform(ks[0], ())
    f_active = 1 + jnp.floor(u_f**1.5 * (mf - 1)).astype(jnp.int32)
    u_n = jax.random.uniform(ks[1], ())
    n_active = cfg.min_ctx + jnp.floor(
        u_n**1.2 * (cfg.num_ctx - cfg.min_ctx)
    ).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
    feat_mask = col < f_active
    row = jax.lax.broadcasted_iota(jnp.int32, (cfg.num_ctx,), 0)
    ctx_mask = row < n_active

    # =========== family A: forward stochastic-conditional regression =======
    # x: correlated mixture of gaussian/uniform marginals.
    x_raw = jax.random.normal(ks[2], (R, F))
    mix_w = jax.random.normal(ks[3], (F, F)) / jnp.sqrt(F)
    alpha = jax.random.uniform(ks[4], ())  # correlation strength
    x_fwd = x_raw * (1 - alpha) + (x_raw @ mix_w) * alpha
    uniformize = jax.random.bernoulli(ks[5], 0.3, (F,))
    x_fwd = jnp.where(uniformize, jax.scipy.stats.norm.cdf(x_fwd) * 2 - 1, x_fwd)
    if cfg.p_heavy_tail > 0:
        # Student-t-ish marginals: scale by an inverse-chi-like mixing factor.
        k_ht1, k_ht2 = jax.random.split(jax.random.fold_in(ks[5], 1))
        heavy = jax.random.bernoulli(k_ht1, cfg.p_heavy_tail, (F,))
        mix = 1.0 / jnp.sqrt(
            jax.random.gamma(k_ht2, 2.0, (R, F)) / 2.0 + 1e-3
        )
        x_fwd = jnp.where(heavy, x_fwd * mix, x_fwd)
    if cfg.p_categorical_feats > 0:
        k_c1, k_c2 = jax.random.split(jax.random.fold_in(ks[5], 2))
        cat = jax.random.bernoulli(k_c1, cfg.p_categorical_feats, (F,))
        n_levels = jax.random.randint(k_c2, (F,), 2, 8).astype(jnp.float32)
        x_quant = jnp.round(
            jax.scipy.stats.norm.cdf(x_fwd) * n_levels - 0.5
        )
        x_fwd = jnp.where(cat, x_quant, x_fwd)
    z = jax.random.normal(ks[6], (R, cfg.latent_dim))
    z_scale = jax.random.uniform(ks[7], (), minval=0.0, maxval=1.5)
    g_in = jnp.concatenate([x_fwd * feat_mask, z * z_scale], axis=-1)
    y_fwd = _random_mlp(ks[8], g_in, 1, cfg.hidden)[:, 0]
    sd_y = jnp.maximum(jnp.std(y_fwd), 1e-6)
    noise_scale = 10.0 ** jax.random.uniform(ks[9], (), minval=-3.0, maxval=-0.3)
    noise = jax.random.normal(ks[10], (R,)) * noise_scale * sd_y
    if cfg.p_heteroscedastic > 0:
        k_h1, k_h2 = jax.random.split(jax.random.fold_in(ks[9], 1))
        het = jax.random.bernoulli(k_h1, cfg.p_heteroscedastic)
        gate = jax.nn.sigmoid(_random_mlp(k_h2, x_fwd * feat_mask, 1, cfg.hidden)[:, 0])
        noise = jnp.where(het, noise * 2.0 * gate, noise)
    y_fwd = y_fwd + noise

    # =========== family B: SBI inverse problem ==============================
    dth = cfg.max_theta_dim
    theta = jax.random.normal(ks[11], (R, dth))
    # Random target dim j and number of simulator-output features.
    j = jax.random.randint(ks[12], (), 0, dth)
    n_sim_feats = jnp.maximum(f_active - j, 1)
    if cfg.p_sym_fold > 0:
        # Sign-symmetry fold: push a random subset of random linear combos
        # of theta through |.| before the simulator. Non-injectivity of this
        # exact shape is what makes two_moons bimodal (|theta0+theta1|,
        # tasks/registry.py:60) and SLCP's theta3/theta4 squares ambiguous —
        # the posterior p(theta_j | x) gains thin reflected modes whose
        # width is set by the simulator noise below.
        kf = jax.random.split(jax.random.fold_in(ks[13], 5), 4)
        do_fold = jax.random.bernoulli(kf[0], cfg.p_sym_fold)
        a_mix = jax.random.normal(kf[1], (dth, dth)) / jnp.sqrt(dth)
        v = theta @ a_mix
        fold_mask = jax.random.bernoulli(kf[2], 0.5, (dth,))
        fold_mask = fold_mask.at[jax.random.randint(kf[3], (), 0, dth)].set(True)
        folded = jnp.where(fold_mask, jnp.abs(v), v)
        theta_sim_in = jnp.where(do_fold, folded, theta)
    else:
        theta_sim_in = theta
    x_sim = _random_mlp(ks[13], theta_sim_in, F, cfg.hidden)
    sim_noise = 10.0 ** jax.random.uniform(ks[14], (), minval=-3.0, maxval=-0.5)
    x_sim = x_sim + jax.random.normal(ks[15], (R, F)) * sim_noise * jnp.maximum(
        jnp.std(x_sim), 1e-6
    )
    # Feature layout: columns [0, n_sim_feats) are simulator outputs,
    # columns [n_sim_feats, n_sim_feats + j) are theta_{<j}.
    theta_col = jnp.clip(col - n_sim_feats, 0, dth - 1)
    theta_feats = jnp.take(theta, theta_col, axis=1)  # [R, F]
    x_inv = jnp.where(col < n_sim_feats, x_sim, theta_feats)
    f_active_inv = jnp.minimum(n_sim_feats + j, F)
    feat_mask_inv = col < f_active_inv
    y_inv = theta[:, j]

    # =========== family C: explicit mixture conditionals ===================
    # p(y|x) = sum_k w_k(x) N(y; mu_k(x), sigma_k^2) — the conditional
    # SHAPES the benchmark posteriors demand and families A/B rarely emit
    # (round-4 diagnosis, results/diagnosis_prior_audit.json): thin
    # well-separated location modes (two_moons/SLCP) and spike+slab scale
    # mixtures (gaussian_mixture). Reuses family A's feature pipeline; the
    # exact conditional is analytic, which the capability probe exploits
    # (scripts/diagnose_multimodal.py).
    if cfg.p_multimodal > 0:
        y_mm, _ = _family_c(jax.random.fold_in(ks[16], 7), cfg, x_fwd * feat_mask)
    # =========== mixture selection ==========================================
    is_inv = jax.random.bernoulli(ks[16], cfg.p_inverse)
    x_all = jnp.where(is_inv, x_inv, x_fwd)
    y_all = jnp.where(is_inv, y_inv, y_fwd)
    feat_mask_a = feat_mask
    feat_mask = jnp.where(is_inv, feat_mask_inv, feat_mask)
    if cfg.p_multimodal > 0:
        # Family C replaces the A/B pick (so p_inverse keeps its meaning
        # within the non-C share).
        is_mm = jax.random.bernoulli(jax.random.fold_in(ks[16], 13), cfg.p_multimodal)
        x_all = jnp.where(is_mm, x_fwd, x_all)
        y_all = jnp.where(is_mm, y_mm, y_all)
        feat_mask = jnp.where(is_mm, feat_mask_a, feat_mask)

    # =========== optional binarization (classifier calibration) ============
    is_bin = jax.random.bernoulli(ks[17], cfg.p_binary)
    thr_q = jax.random.uniform(ks[18], (), minval=0.15, maxval=0.85)
    thr = jnp.quantile(y_all, thr_q)
    y_all = jnp.where(is_bin, (y_all > thr).astype(y_all.dtype), y_all)

    x_all = x_all * feat_mask
    x_ctx, x_qry = x_all[: cfg.num_ctx], x_all[cfg.num_ctx :]
    y_ctx, y_qry = y_all[: cfg.num_ctx], y_all[cfg.num_ctx :]
    return x_ctx, y_ctx, x_qry, y_qry, feat_mask, ctx_mask


@partial(jax.jit, static_argnums=(1, 2))
def sample_tasks(
    rng: jax.Array, num_datasets: int, cfg: PriorConfig, max_feat=None
) -> TaskBatch:
    """Batch of synthetic tasks: one jit-compiled call, data born on device."""
    rngs = jax.random.split(rng, num_datasets)
    out = jax.vmap(lambda r: _sample_one(r, cfg, max_feat))(rngs)
    return TaskBatch(*out)
