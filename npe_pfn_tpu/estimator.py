"""Core NPE-PFN estimator, TPU-native.

Rebuild of the reference's ``NPE_PFN_Core`` / ``TabPFN_Based_NPE_PFN``
(reference: npe_pfn.py:26-600, 708-744) on top of the TabICA in-context
transformer. Key architectural departures, all driven by XLA semantics:

- The reference's per-dimension Python loop of ``model.fit`` +
  ``model.predict`` (npe_pfn.py:135-167) becomes ONE ``lax.scan`` over θ
  dimensions whose step encodes the context once (fit analog) and streams
  all query rows against the cached context in fixed chunks (predict
  analog). Static shapes → a single compiled executable serves every
  dimension, every call.
- ``sample`` and ``sample_batched`` (npe_pfn.py:111-251) share that one
  kernel: batched sampling is just more query rows (x repeated per sample).
  The reference needed two code paths because PyTorch-side refits were the
  unit of cost.
- ``log_prob_batched`` — NotImplemented in the reference (npe_pfn.py:457-460)
  — falls out for free (same scan, scoring instead of sampling).
- Rejection against the prior support is a fixed-shape oversample+mask loop
  at the Python level with the reference's escape hatches (adaptive batch,
  max-iteration fill with unfiltered samples; accept_reject_sampler.py:67-77)
  preserved as explicit, documented diagnostics.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import filters as filters_mod
from . import preprocessing
from .distributions import BoxUniform, Distribution
from .models import checkpoint as ckpt_mod
from .models import regressor
from .models.regressor import TabICAModel

Array = jnp.ndarray


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Jitted autoregressive kernels
# ---------------------------------------------------------------------------


def _eff_features(model: TabICAModel, dx: int, dth: int) -> int:
    """Static effective feature width for the AR kernels.

    TabICA's columns are structurally independent — no positional
    embeddings, cells of inactive columns are zeroed at embedding and
    masked (-inf) as keys in feature attention, and row attention is
    per-column (models/transformer.py:15-27) — so computing with only the
    first ``dx + dth`` columns (rounded up to 8 for TPU tiling) is EXACTLY
    equal to the full padded width (tests/test_feature_slice.py pins it).
    Row-attention cost scales with T = f+1 and feature attention with T²,
    so a 2-D task (two_moons: T 9 vs 33) gets a ~3x lighter kernel for
    free. ``NPE_PFN_TPU_FEATURE_SLICE=0`` restores the full width (read at
    trace time, like NPE_PFN_TPU_FUSED)."""
    f_full = model.cfg.max_features
    if os.environ.get("NPE_PFN_TPU_FEATURE_SLICE", "1") == "0":
        return f_full
    return min(f_full, max(8, _round_up(dx + dth, 8)))


def _order_prefix_masks(order: Array, dx: int, f: int) -> Array:
    """[dθ, f] bool: mask[i] = x columns ∪ θ columns sampled before step i
    under ``order`` (the AR factorization's conditioning set)."""
    dth = order.shape[0]
    onehot = jax.nn.one_hot(dx + order, f, dtype=jnp.int32)  # [dθ, f]
    before = jnp.cumsum(onehot, axis=0) - onehot  # exclusive prefix
    return (jnp.arange(f)[None, :] < dx) | (before > 0)


@partial(jax.jit, static_argnames=("qry_chunk", "target_transform", "feature_width"))
def autoregressive_sample(
    model: TabICAModel,
    theta_ctx: Array,  # [N, dθ] context parameters
    x_ctx: Array,  # [N, dx]  context observations
    ctx_mask: Array,  # [N] real-row mask
    x_qry: Array,  # [Q, dx]  observation per query row (repeat per sample)
    rng: jax.Array,
    qry_chunk: int = 1024,
    target_transform: str = "zscore",
    dim_order: Optional[Array] = None,
    feature_width: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Draw θ ~ q(θ|x) autoregressively per dimension.

    Replaces the reference hot loop npe_pfn.py:135-167 / 211-241. Returns
    (theta [Q, dθ], log_prob [Q]) — log-probs are the free by-product of
    sampling from the bar distribution.

    ``target_transform="quantile"`` maps each dimension's context targets to
    normal scores before encoding (TabPFN preprocessing-ensemble variant,
    SURVEY §2.4) — adaptive bar resolution for thin posterior modes; samples
    are mapped back and log-probs carry the Jacobian.

    ``dim_order`` (a permutation of arange(dθ)) picks the AR factorization
    order: step i conditions on x and the already-sampled dims order[:i] and
    samples dim order[i]. Different orders are different (valid)
    approximations of the same posterior — NPEPFN can ensemble over them
    (num_order_ensembles), the analog of TabPFN's preprocessing ensembles
    for the factorization axis.

    A ``"+featq"`` suffix on ``target_transform`` additionally maps every
    FEATURE column (x and θ-as-conditioning) to normal scores fitted on the
    masked context — TabPFN's feature-side preprocessing-ensemble member
    (SURVEY §2.4); queries ride the same fitted maps, no Jacobian owed.
    """
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    n, dth = theta_ctx.shape
    q, dx = x_qry.shape
    if dx + dth > model.cfg.max_features:
        raise ValueError(
            f"dx+dtheta = {dx + dth} exceeds model feature budget "
            f"{model.cfg.max_features}; use an embedding_net (e.g. "
            "RandomProjectionEmbedding) to compress x"
        )
    f = feature_width or _eff_features(model, dx, dth)
    assert q % qry_chunk == 0, "pad query rows to a multiple of qry_chunk"

    xc = jnp.zeros((n, f), theta_ctx.dtype)
    xc = xc.at[:, :dx].set(x_ctx).at[:, dx : dx + dth].set(theta_ctx)
    if feat_q:
        qts_f = preprocessing.quantile_fit_cols(xc, ctx_mask)
        xc = preprocessing.quantile_forward_cols(qts_f, xc)
    order = jnp.arange(dth) if dim_order is None else jnp.asarray(dim_order)
    prefix_masks = _order_prefix_masks(order, dx, f)

    def make_step(w):
        """Scan body computing at feature width ``w`` <= f. Exact: columns
        beyond the step's conditioning prefix are masked to zero keys /
        zero cells, so slicing them off changes nothing
        (tests/test_feature_slice.py pins masked == removed)."""
        xc_w = xc[:, :w]

        def step(theta_sm, inp):
            oi, feat_mask, key = inp
            y_raw = jnp.take(theta_ctx, oi, axis=1)
            if target_transform == "quantile":
                qt = preprocessing.quantile_fit(y_raw, ctx_mask)
                y_ctx = preprocessing.quantile_forward(qt, y_raw)
            else:
                y_ctx = y_raw
            fitted = regressor.fit_encode(
                model, xc_w, y_ctx, feat_mask, ctx_mask
            )
            xq = jnp.zeros((q, w), x_qry.dtype)
            xq = xq.at[:, :dx].set(x_qry)
            nset = min(w - dx, dth)
            if nset > 0:
                xq = xq.at[:, dx : dx + nset].set(theta_sm[:, :nset])
            if feat_q:
                qts_w = jax.tree_util.tree_map(lambda a: a[:w], qts_f)
                xq = preprocessing.quantile_forward_cols(qts_w, xq)
            logits = jax.lax.map(
                lambda chunk: regressor.predict_logits(model, fitted, chunk),
                xq.reshape(q // qry_chunk, qry_chunk, w),
            ).reshape(q, -1)
            th_i = regressor.sample_y(key, model, fitted, logits)
            lp_i = regressor.log_prob_y(model, fitted, logits, th_i)
            if target_transform == "quantile":
                th_i = preprocessing.quantile_inverse(qt, th_i)
                lp_i = lp_i + preprocessing.quantile_log_det(qt, th_i)
            return theta_sm.at[:, oi].set(th_i), lp_i

        return step

    keys = jax.random.split(rng, dth)
    theta0 = jnp.zeros((q, dth), x_qry.dtype)

    # Prefix-width specialization (identity order only, where step i's
    # conditioning set is statically the first dx+i columns): early AR
    # steps run at a narrower padded width — at the bench shape
    # (dx=dθ=10, f=24) steps 0-6 run at width 16 (T 17 vs 25 tokens),
    # ~22% fewer decode/encode FLOPs overall, exactly (feature-slice
    # invariance above). The scan splits into one lax.scan per distinct
    # width; same keys, same per-step semantics. Passing an explicit
    # ``feature_width`` keeps the single-scan trace (callers that share
    # one trace across tasks rely on that, and tests use it as the exact
    # reference); NPE_PFN_TPU_PREFIX_SLICE=0 also restores it.
    widths = None
    if (
        dim_order is None
        and feature_width is None
        and os.environ.get("NPE_PFN_TPU_PREFIX_SLICE", "1") != "0"
    ):
        widths = [min(f, max(8, _round_up(max(dx + i, 1), 8))) for i in range(dth)]
        if len(set(widths)) == 1:
            widths = None
    if widths is None:
        theta, lps = jax.lax.scan(
            make_step(f), theta0, (order, prefix_masks, keys)
        )
        return theta, jnp.sum(lps, axis=0)

    theta_sm, lp_parts, i = theta0, [], 0
    while i < dth:
        j = i
        while j < dth and widths[j] == widths[i]:
            j += 1
        w = widths[i]
        theta_sm, lps = jax.lax.scan(
            make_step(w),
            theta_sm,
            (order[i:j], prefix_masks[i:j, :w], keys[i:j]),
        )
        lp_parts.append(lps)
        i = j
    return theta_sm, jnp.sum(jnp.concatenate(lp_parts, axis=0), axis=0)


@partial(jax.jit, static_argnames=("qry_chunk", "target_transform", "feature_width"))
def autoregressive_log_prob(
    model: TabICAModel,
    theta_ctx: Array,
    x_ctx: Array,
    ctx_mask: Array,
    x_qry: Array,  # [Q, dx]
    theta_eval: Array,  # [Q, dθ]
    qry_chunk: int = 1024,
    target_transform: str = "zscore",
    dim_order: Optional[Array] = None,
    feature_width: Optional[int] = None,
) -> Array:
    """Score log q(θ|x) autoregressively (reference npe_pfn.py:462-524).
    Like the reference, no truncation/leakage correction (npe_pfn.py:475).
    Densities are finite by construction (full-support bar distribution), so
    the reference's -inf→log(eps) flooring (npe_pfn.py:153-158) is moot.
    ``dim_order`` scores the factorization along that permutation (see
    autoregressive_sample)."""
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    n, dth = theta_ctx.shape
    q, dx = x_qry.shape
    f = feature_width or _eff_features(model, dx, dth)
    assert q % qry_chunk == 0

    xc = jnp.zeros((n, f), theta_ctx.dtype)
    xc = xc.at[:, :dx].set(x_ctx).at[:, dx : dx + dth].set(theta_ctx)
    xq_full = jnp.zeros((q, f), x_qry.dtype)
    xq_full = xq_full.at[:, :dx].set(x_qry).at[:, dx : dx + dth].set(theta_eval)
    if feat_q:
        qts_f = preprocessing.quantile_fit_cols(xc, ctx_mask)
        xc = preprocessing.quantile_forward_cols(qts_f, xc)
        xq_full = preprocessing.quantile_forward_cols(qts_f, xq_full)
    order = jnp.arange(dth) if dim_order is None else jnp.asarray(dim_order)
    prefix_masks = _order_prefix_masks(order, dx, f)

    def make_step(w):
        xc_w = xc[:, :w]
        xq_w = xq_full[:, :w]

        def step(_, inp):
            oi, feat_mask = inp
            y_raw = jnp.take(theta_ctx, oi, axis=1)
            th_i = jnp.take(theta_eval, oi, axis=1)
            if target_transform == "quantile":
                qt = preprocessing.quantile_fit(y_raw, ctx_mask)
                y_ctx = preprocessing.quantile_forward(qt, y_raw)
                th_eval_i = preprocessing.quantile_forward(qt, th_i)
            else:
                y_ctx, th_eval_i = y_raw, th_i
            fitted = regressor.fit_encode(
                model, xc_w, y_ctx, feat_mask, ctx_mask
            )
            logits = jax.lax.map(
                lambda chunk: regressor.predict_logits(model, fitted, chunk),
                xq_w.reshape(q // qry_chunk, qry_chunk, w),
            ).reshape(q, -1)
            lp_i = regressor.log_prob_y(model, fitted, logits, th_eval_i)
            if target_transform == "quantile":
                lp_i = lp_i + preprocessing.quantile_log_det(qt, th_i)
            return None, lp_i

        return step

    # Prefix-width specialization — same exactness argument and gating as
    # autoregressive_sample above.
    widths = None
    if (
        dim_order is None
        and feature_width is None
        and os.environ.get("NPE_PFN_TPU_PREFIX_SLICE", "1") != "0"
    ):
        widths = [min(f, max(8, _round_up(max(dx + i, 1), 8))) for i in range(dth)]
        if len(set(widths)) == 1:
            widths = None
    if widths is None:
        _, lps = jax.lax.scan(make_step(f), None, (order, prefix_masks))
        return jnp.sum(lps, axis=0)

    lp_parts, i = [], 0
    while i < dth:
        j = i
        while j < dth and widths[j] == widths[i]:
            j += 1
        w = widths[i]
        _, lps = jax.lax.scan(
            make_step(w), None, (order[i:j], prefix_masks[i:j, :w])
        )
        lp_parts.append(lps)
        i = j
    return jnp.sum(jnp.concatenate(lp_parts, axis=0), axis=0)


@partial(jax.jit, static_argnames=("qry_chunk", "target_transform", "feature_width"))
def autoregressive_sample_ensemble(
    model: TabICAModel,
    theta_ctx: Array,  # [E, Ne, dθ] — context split into E ensemble members
    x_ctx: Array,  # [E, Ne, dx]
    ctx_mask: Array,  # [E, Ne]
    x_qry: Array,  # [Q, dx]
    rng: jax.Array,
    qry_chunk: int = 1024,
    target_transform: str = "zscore",
    feature_width: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Ensemble-mixture autoregressive sampling.

    TabPFN's accuracy relies on averaging an ensemble of preprocessing
    variants (SURVEY §2.4); TabICA is exactly column-permutation-invariant so
    feature shuffles are moot — instead the ensemble is over CONTEXT SUBSETS:
    each member encodes its own rows/normalization, and the per-dimension
    conditional is the equal-weight mixture of member bar distributions
    (sampled by picking a member per query row; scored by logsumexp).
    """
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    e, n_e, dth = theta_ctx.shape
    q, dx = x_qry.shape
    f = feature_width or _eff_features(model, dx, dth)
    assert q % qry_chunk == 0

    xc = jnp.zeros((e, n_e, f), theta_ctx.dtype)
    xc = xc.at[..., :dx].set(x_ctx).at[..., dx : dx + dth].set(theta_ctx)
    if feat_q:
        qts_f = jax.vmap(preprocessing.quantile_fit_cols)(xc, ctx_mask)
        xc = jax.vmap(preprocessing.quantile_forward_cols)(qts_f, xc)
    col = jnp.arange(f)

    def step(theta_sm, inp):
        i, key = inp
        feat_mask = col < dx + i
        y_raw = jnp.take(theta_ctx, i, axis=2)  # [E, Ne]
        if target_transform == "quantile":
            qts = jax.vmap(preprocessing.quantile_fit)(y_raw, ctx_mask)
            y_ctx = jax.vmap(preprocessing.quantile_forward)(qts, y_raw)
        else:
            y_ctx = y_raw
        fitted = jax.vmap(
            lambda xcm, ycm, cmm: regressor.fit_encode(model, xcm, ycm, feat_mask, cmm)
        )(xc, y_ctx, ctx_mask)
        xq = jnp.zeros((q, f), x_qry.dtype)
        xq = xq.at[:, :dx].set(x_qry).at[:, dx : dx + dth].set(theta_sm)
        if feat_q:
            # per-member fitted feature maps → per-member query matrices
            xq_e = jax.vmap(
                lambda qm: preprocessing.quantile_forward_cols(qm, xq)
            )(qts_f)  # [E, Q, f]
            logits = jax.vmap(
                lambda fm, xqm: jax.lax.map(
                    lambda c: regressor.predict_logits(model, fm, c),
                    xqm.reshape(q // qry_chunk, qry_chunk, f),
                ).reshape(q, -1)
            )(fitted, xq_e)  # [E, Q, B]
        else:
            chunks = xq.reshape(q // qry_chunk, qry_chunk, f)
            logits = jax.vmap(
                lambda fm: jax.lax.map(
                    lambda c: regressor.predict_logits(model, fm, c), chunks
                ).reshape(q, -1)
            )(fitted)  # [E, Q, B]

        k_m, k_s = jax.random.split(key)
        member = jax.random.randint(k_m, (q,), 0, e)
        yn = jax.vmap(lambda lg: _bar_sample(model, k_s, lg))(logits)  # [E, Q] norm
        y_e = yn * fitted.stats.sd_y[:, None] + fitted.stats.mu_y[:, None]
        if target_transform == "quantile":
            y_e = jax.vmap(preprocessing.quantile_inverse)(qts, y_e)
        th_i = jnp.take_along_axis(y_e, member[None, :], axis=0)[0]

        th_b = jnp.broadcast_to(th_i[None, :], (e, q))
        if target_transform == "quantile":
            z_b = jax.vmap(preprocessing.quantile_forward)(qts, th_b)
            jac = jax.vmap(preprocessing.quantile_log_det)(qts, th_b)
        else:
            z_b, jac = th_b, jnp.zeros((e, q), th_b.dtype)
        yn_all = (z_b - fitted.stats.mu_y[:, None]) / fitted.stats.sd_y[:, None]
        lp_e = jax.vmap(
            lambda lg, ynm, sdm: _bar_log_prob(model, lg, ynm) - jnp.log(sdm)
        )(logits, yn_all, jnp.broadcast_to(fitted.stats.sd_y[:, None], (e, q))) + jac
        lp_i = jax.scipy.special.logsumexp(lp_e, axis=0) - math.log(e)
        return theta_sm.at[:, i].set(th_i), lp_i

    keys = jax.random.split(rng, dth)
    theta0 = jnp.zeros((q, dth), x_qry.dtype)
    theta, lps = jax.lax.scan(step, theta0, (jnp.arange(dth), keys))
    return theta, jnp.sum(lps, axis=0)


@partial(jax.jit, static_argnames=("qry_chunk", "target_transform", "feature_width"))
def autoregressive_log_prob_ensemble(
    model: TabICAModel,
    theta_ctx: Array,  # [E, Ne, dθ]
    x_ctx: Array,  # [E, Ne, dx]
    ctx_mask: Array,  # [E, Ne]
    x_qry: Array,  # [Q, dx]
    theta_eval: Array,  # [Q, dθ]
    qry_chunk: int = 1024,
    target_transform: str = "zscore",
    feature_width: Optional[int] = None,
) -> Array:
    """Score log q(θ|x) under the same context-subset mixture that
    autoregressive_sample_ensemble draws from."""
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    e, n_e, dth = theta_ctx.shape
    q, dx = x_qry.shape
    f = feature_width or _eff_features(model, dx, dth)
    assert q % qry_chunk == 0

    xc = jnp.zeros((e, n_e, f), theta_ctx.dtype)
    xc = xc.at[..., :dx].set(x_ctx).at[..., dx : dx + dth].set(theta_ctx)
    xq = jnp.zeros((q, f), x_qry.dtype)
    xq = xq.at[:, :dx].set(x_qry).at[:, dx : dx + dth].set(theta_eval)
    if feat_q:
        qts_f = jax.vmap(preprocessing.quantile_fit_cols)(xc, ctx_mask)
        xc = jax.vmap(preprocessing.quantile_forward_cols)(qts_f, xc)
        xq_e = jax.vmap(
            lambda qm: preprocessing.quantile_forward_cols(qm, xq)
        )(qts_f)  # [E, Q, f]
    chunks = xq.reshape(q // qry_chunk, qry_chunk, f)
    col = jnp.arange(f)

    def step(_, i):
        feat_mask = col < dx + i
        y_raw = jnp.take(theta_ctx, i, axis=2)
        if target_transform == "quantile":
            qts = jax.vmap(preprocessing.quantile_fit)(y_raw, ctx_mask)
            y_ctx = jax.vmap(preprocessing.quantile_forward)(qts, y_raw)
        else:
            y_ctx = y_raw
        fitted = jax.vmap(
            lambda xcm, ycm, cmm: regressor.fit_encode(model, xcm, ycm, feat_mask, cmm)
        )(xc, y_ctx, ctx_mask)
        if feat_q:
            logits = jax.vmap(
                lambda fm, xqm: jax.lax.map(
                    lambda c: regressor.predict_logits(model, fm, c),
                    xqm.reshape(q // qry_chunk, qry_chunk, f),
                ).reshape(q, -1)
            )(fitted, xq_e)
        else:
            logits = jax.vmap(
                lambda fm: jax.lax.map(
                    lambda c: regressor.predict_logits(model, fm, c), chunks
                ).reshape(q, -1)
            )(fitted)
        th_i = jnp.take(theta_eval, i, axis=1)
        th_b = jnp.broadcast_to(th_i[None, :], (e, q))
        if target_transform == "quantile":
            z_b = jax.vmap(preprocessing.quantile_forward)(qts, th_b)
            jac = jax.vmap(preprocessing.quantile_log_det)(qts, th_b)
        else:
            z_b, jac = th_b, jnp.zeros((e, q), th_b.dtype)
        yn = (z_b - fitted.stats.mu_y[:, None]) / fitted.stats.sd_y[:, None]
        lp_e = jax.vmap(
            lambda lg, ynm, sdm: _bar_log_prob(model, lg, ynm) - jnp.log(sdm)
        )(logits, yn, jnp.broadcast_to(fitted.stats.sd_y[:, None], (e, q))) + jac
        return None, jax.scipy.special.logsumexp(lp_e, axis=0) - math.log(e)

    _, lps = jax.lax.scan(step, None, jnp.arange(dth))
    return jnp.sum(lps, axis=0)


def _bar_sample(model, rng, logits):
    from .models import bar_distribution as bar

    return bar.sample(rng, model.borders, logits)


def _bar_log_prob(model, logits, yn):
    from .models import bar_distribution as bar

    return bar.log_prob(model.borders, logits, yn)


def split_context_ensemble(theta_ctx, x_ctx, ctx_mask, num_ensembles: int):
    """Round-robin split of a (possibly distance-ordered) context into E
    members — stratified so every member sees the full distance range."""
    n = theta_ctx.shape[0]
    n_e = n // num_ensembles
    idx = jnp.arange(n_e * num_ensembles).reshape(n_e, num_ensembles).T  # [E, Ne]
    return theta_ctx[idx], x_ctx[idx], ctx_mask[idx]


# ---------------------------------------------------------------------------
# Density-ratio log_prob (classifier path)
# ---------------------------------------------------------------------------


@dataclass
class DensityRatioEstimator:
    """Ratio-based log_prob via a posterior-vs-uniform in-context classifier.

    Analog of the reference's DensityRatioWrapper (npe_pfn.py:603-704):
    posterior samples get label 1, uniform draws from a padded bounding box
    get label 0; then log p(θ|x) ≈ log u(θ) + log(p₁+ε) − log(p₀+ε). The
    classifier here is TabICA's posterior-mean-of-{0,1} head — no separate
    model. The fit is cached on (x, context fingerprint, n_samples, padding)
    exactly like the reference's refit_necessary (npe_pfn.py:663-681).

    ``num_fits > 1`` ensembles independent classifier contexts (disjoint
    posterior subsets + fresh uniform negatives) and averages their
    probabilities: the reference trains its classifier on all ~5000 posterior
    draws (npe_pfn.py:620-661), whereas one in-context fit here sees only
    ``context_size`` rows — ensembling recovers coverage of the full draw
    budget without exceeding the context ceiling.
    """

    model: TabICAModel
    context_size: int = 512  # classifier context rows (pos+neg) per fit
    num_fits: int = 1
    eps: float = 1e-12

    _cache_key: Optional[tuple] = field(default=None, repr=False)
    _ctx_theta: Optional[Array] = field(default=None, repr=False)
    _ctx_labels: Optional[Array] = field(default=None, repr=False)
    _low: Optional[Array] = field(default=None, repr=False)
    _high: Optional[Array] = field(default=None, repr=False)
    _log_u: float = 0.0

    def refit_necessary(self, x, ctx_fingerprint, n_samples, padding) -> bool:
        if self._cache_key is None:
            return True
        kx, kf, kn, kp = self._cache_key
        return not (
            kn == n_samples
            and kp == padding
            and kf == ctx_fingerprint
            and np.allclose(kx, np.asarray(x))
        )

    def fit(self, rng, posterior_samples: Array, x, ctx_fingerprint, padding: float = 0.1):
        n_half = self.context_size // 2
        k1, k2 = jax.random.split(rng)
        lo = jnp.min(posterior_samples, axis=0)
        hi = jnp.max(posterior_samples, axis=0)
        span = hi - lo
        self._low = lo - padding * span
        self._high = hi + padding * span
        self._log_u = float(-jnp.sum(jnp.log(jnp.maximum(self._high - self._low, 1e-12))))
        # One permutation, sliced into (wrapping) disjoint positive subsets
        # per fit; each fit gets fresh uniform negatives.
        perm = jax.random.permutation(k1, posterior_samples.shape[0])
        n_post = posterior_samples.shape[0]
        ctxs, labels = [], []
        for f_i in range(self.num_fits):
            idx = jnp.take(
                perm, (jnp.arange(n_half) + f_i * n_half) % n_post, axis=0
            )
            pos = posterior_samples[idx]
            neg = BoxUniform(self._low, self._high).sample(
                jax.random.fold_in(k2, f_i), (n_half,)
            )
            ctxs.append(jnp.concatenate([pos, neg], axis=0))
            labels.append(
                jnp.concatenate([jnp.ones((n_half,)), jnp.zeros((n_half,))])
            )
        self._ctx_theta = jnp.stack(ctxs)  # [num_fits, ctx, dθ]
        self._ctx_labels = jnp.stack(labels)  # [num_fits, ctx]
        self._cache_key = (
            np.asarray(x).copy(),
            ctx_fingerprint,
            posterior_samples.shape[0],
            padding,
        )

    def ratio_log_probs(self, theta: Array, chunk_size: int = 10_000) -> Array:
        """Reference semantics npe_pfn.py:683-704: out-of-box θ gets the
        floor log u + log ε − log(1+ε). θ is scored through the classifier in
        chunks of ``chunk_size`` rows (the reference chunks by
        max_sampling_batch_size, npe_pfn.py:436) so 100k-θ grids don't
        materialize one giant joint forward."""
        n = theta.shape[0]
        p1_parts = []
        for start in range(0, n, chunk_size):
            chunk = theta[start : start + chunk_size]
            nc = chunk.shape[0]
            pad = _round_up(nc, 256) - nc  # fixed shape granule: no retraces
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, chunk.shape[1]), chunk.dtype)], axis=0
                )
            # Average class probabilities over the fit ensemble (mixture of
            # classifiers), not log-ratios — keeps p₁+p₀ = 1.
            p1_acc = 0.0
            for f_i in range(self._ctx_theta.shape[0]):
                probs = regressor.predict_proba(
                    self.model, self._ctx_theta[f_i], self._ctx_labels[f_i], chunk
                )
                p1_acc = p1_acc + probs[:, 1]
            p1_parts.append(np.asarray(p1_acc[:nc]) / self._ctx_theta.shape[0])
        p1 = jnp.asarray(np.concatenate(p1_parts, axis=0))
        p0 = 1.0 - p1
        inside = jnp.all((theta >= self._low) & (theta <= self._high), axis=-1)
        lp = self._log_u + jnp.log(p1 + self.eps) - jnp.log(p0 + self.eps)
        floor = self._log_u + math.log(self.eps) - math.log(1 + self.eps)
        return jnp.where(inside, lp, floor)


# ---------------------------------------------------------------------------
# The estimator
# ---------------------------------------------------------------------------


class NPEPFN:
    """Training-free neural posterior estimator (NPE-PFN), TPU-native.

    Unifies the reference's ``NPE_PFN_Core`` (no filtering) and
    ``TabPFN_Based_NPE_PFN`` (per-observation context filtering,
    npe_pfn.py:708-744): pass ``filter_type="no_filtering"`` for core
    semantics. Batched sampling always uses the shared unfiltered context —
    filtering and true batching are mutually exclusive by design (reference
    comment npe_pfn.py:707).
    """

    def __init__(
        self,
        prior: Optional[Distribution] = None,
        model: Optional[TabICAModel] = None,
        filter_type: Union[str, Callable] = "standardized_euclidean_filtering",
        filter_context_size: int = 2048,
        embedding_net: Optional[Callable[[Array], Array]] = None,
        # Default differs from the reference (npe_pfn.py:425 ratio_based) by
        # design: the reference preferred the ratio classifier because its
        # autoregressive path cost dim_θ separate TabPFN fits per call; here
        # AR log_prob is one fused scan (encode-once per dim, queries
        # streamed) AND tracks exact densities far better — measured corr vs
        # analytic posteriors ~0.98 (AR) vs ~0.6 (ratio), see
        # scripts/validate_log_prob.py / results/log_prob_validation.json.
        log_prob_mode: str = "autoregressive",
        qry_chunk: int = 1024,
        ratio_context_size: int = 512,
        num_ratio_fits: int = 1,
        seed: int = 0,
        show_progress_bars: bool = False,
        x_shape: Optional[Tuple[int, ...]] = None,
        num_ensembles: int = 1,
        num_order_ensembles: int = 1,
        target_transform: str = "zscore",
        feature_transform: str = "none",
    ):
        if target_transform not in ("zscore", "quantile"):
            raise ValueError(f"unknown target_transform {target_transform!r}")
        if feature_transform not in ("none", "quantile"):
            raise ValueError(f"unknown feature_transform {feature_transform!r}")
        if model is None:
            model, trained = ckpt_mod.load_default()
            if not trained:
                import warnings

                warnings.warn(
                    "no pretrained TabICA checkpoint found — using random "
                    "weights; posterior quality will be garbage. Run "
                    "scripts/pretrain_tabica.py or set NPE_PFN_TPU_CHECKPOINT."
                )
        self.model = model
        self.prior = prior
        self.filter_fn = filters_mod.get_filtering_method(filter_type)
        self.filter_context_size = int(filter_context_size)
        self.embedding_net = embedding_net
        self.log_prob_mode = log_prob_mode
        self.qry_chunk = int(qry_chunk)
        self.show_progress_bars = show_progress_bars
        # TabPFN-style ensembling over context subsets (mixture of members).
        self.num_ensembles = int(num_ensembles)
        # Ensembling over AR factorization orders (mixture over dim orders;
        # the TabPFN preprocessing-ensemble analog for the factorization
        # axis). Mutually exclusive with num_ensembles > 1 for now.
        self.num_order_ensembles = int(num_order_ensembles)
        if self.num_ensembles > 1 and self.num_order_ensembles > 1:
            raise ValueError(
                "num_ensembles and num_order_ensembles cannot both exceed 1"
            )
        # Target preprocessing: "zscore" (plain) or "quantile" (normal-score
        # transform per θ-dimension — TabPFN preprocessing-ensemble variant).
        # feature_transform="quantile" additionally normal-scores every
        # FEATURE column (TabPFN also transforms X per ensemble member,
        # SURVEY §2.4); it rides the same static spec string the kernels
        # thread ("+featq" suffix, preprocessing.parse_transform).
        self.feature_transform = feature_transform
        self.target_transform = target_transform + (
            "+featq" if feature_transform == "quantile" else ""
        )
        # Pre-embedding observation shape for reshaping raw inputs before the
        # embedding net (reference npe_pfn.py:272-274 x.reshape(-1, *x_shape)).
        self.x_shape = tuple(x_shape) if x_shape is not None else None
        self._rng = jax.random.PRNGKey(seed)
        self._theta_train: Optional[Array] = None
        self._x_train: Optional[Array] = None
        self._ctx_version = 0
        self.ratio_context_size = int(ratio_context_size)
        self.num_ratio_fits = int(num_ratio_fits)
        self._ratio = DensityRatioEstimator(
            model, context_size=self.ratio_context_size,
            num_fits=self.num_ratio_fits,
        )
        # Jitted one-dispatch rejection samplers, keyed on static config
        # (see _fused_rejection). Never pickled.
        self._fused_rej_cache: dict = {}

    # -- state / serialization (reference pickle hooks npe_pfn.py:57-71) ----

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_theta_train"] = (
            None if self._theta_train is None else np.asarray(self._theta_train)
        )
        state["_x_train"] = None if self._x_train is None else np.asarray(self._x_train)
        state["_ratio"] = None  # lazily rebuilt, like the reference drops models
        state["_fused_rej_cache"] = {}  # jitted closures are not picklable
        state["_sim_cache"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self._theta_train is not None:
            self._theta_train = jnp.asarray(self._theta_train)
            self._x_train = jnp.asarray(self._x_train)
        self._ratio = DensityRatioEstimator(
            self.model,
            context_size=getattr(self, "ratio_context_size", 512),
            num_fits=getattr(self, "num_ratio_fits", 1),
        )
        self._fused_rej_cache = {}

    # -- data ----------------------------------------------------------------

    def _next_rng(self, rng: Optional[jax.Array]) -> jax.Array:
        if rng is not None:
            return rng
        self._rng, out = jax.random.split(self._rng)
        return out

    def append_simulations(self, theta, x) -> "NPEPFN":
        """Store (θ, x) sims as estimator context. Like the reference
        (npe_pfn.py:73-82), this REPLACES previous data."""
        theta = jnp.asarray(theta, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        theta = self._validate(theta, "theta")
        x = self._validate(x, "x")
        if theta.shape[0] != x.shape[0]:
            raise ValueError("theta and x must have the same number of rows")
        if self.embedding_net is not None:
            # Same contract as _prep_obs / sample_refined: a shaped embedding
            # net (x_shape set) receives context rows in that shape too
            # (reference npe_pfn.py:272-274 reshapes before embedding).
            if self.x_shape is not None:
                x = jnp.asarray(
                    self.embedding_net(x.reshape(-1, *self.x_shape))
                ).reshape(x.shape[0], -1)
            else:
                x = jnp.asarray(self.embedding_net(x))
        self._theta_train, self._x_train = theta, x
        self._ctx_version += 1
        return self

    @staticmethod
    def _validate(arr: Array, name: str) -> Array:
        if arr.ndim == 1:
            arr = arr[:, None]
        if arr.ndim != 2:
            raise ValueError(f"{name} must be 2D [num_sims, dim], got {arr.shape}")
        return arr

    @property
    def num_simulations(self) -> int:
        return 0 if self._theta_train is None else int(self._theta_train.shape[0])

    @property
    def _effective_context_size(self) -> int:
        """filter_context_size clamped to the (256-granule-padded) dataset
        size: filters pad to a FIXED shape, so without the clamp a large
        default makes small datasets pay encode cost for all-padding rows.
        The 256 granule keeps shapes static per dataset-size bucket.
        Large defaults are justified by the measured length-generalization
        curve (results/length_generalization.jsonl: C2ST improves
        monotonically to 8192 rows)."""
        n = self._theta_train.shape[0]
        return min(self.filter_context_size, _round_up(n, 256))

    def get_context(self, x_o: Array, rng: Optional[jax.Array] = None):
        """Per-observation filtered, padded context (npe_pfn.py:739-744)."""
        if self._theta_train is None:
            raise RuntimeError("call append_simulations first")
        return self.filter_fn(
            x_o,
            self._theta_train,
            self._x_train,
            self._effective_context_size,
            rng=self._next_rng(rng),
        )

    def _run_simulator(self, simulator, keys: Array, theta: Array) -> Array:
        """Vectorized simulator driver for sample_refined / TSNPE refinement.

        Jax-traceable simulators run as ONE jitted vmap on device; the
        compiled callable is cached per simulator object (weakly — dropping
        the simulator drops the cache entry) so repeated refinement calls
        reuse the trace. Non-traceable simulators (numpy/scipy, like the
        reference's un-jitted simulate_for_sbi path, tsnpe_pfn.py:40-77)
        fall back to a host loop.
        """
        cache = getattr(self, "_sim_cache", None)
        if cache is None:
            import weakref

            cache = self._sim_cache = weakref.WeakKeyDictionary()
        try:
            fn = cache.get(simulator)
        except TypeError:  # unhashable / non-weakrefable callable
            fn = None
            cache = None
        if fn is None:
            fn = jax.jit(jax.vmap(simulator))
            if cache is not None:
                try:
                    cache[simulator] = fn
                except TypeError:
                    pass
        try:
            return jnp.asarray(fn(keys, theta))
        except Exception:
            theta_h = np.asarray(theta)
            keys_h = np.asarray(keys)
            out = [
                np.asarray(simulator(jnp.asarray(keys_h[i]), theta_h[i]))
                for i in range(theta_h.shape[0])
            ]
            return jnp.asarray(np.stack(out))

    def _prep_obs(self, x) -> Array:
        """Apply the embedding net to an observation (npe_pfn.py:272-274)."""
        x = jnp.asarray(x, jnp.float32)
        if self.embedding_net is not None:
            if self.x_shape is not None:
                x = x.reshape(-1, *self.x_shape)
                x = jnp.asarray(self.embedding_net(x))
                return x[0] if x.shape[0] == 1 else x
            squeeze = x.ndim == 1
            x = jnp.asarray(self.embedding_net(x[None] if squeeze else x))
            if squeeze:
                x = x[0]
        return x

    @staticmethod
    def _num_from_shape(num) -> int:
        """Accept an int or a torch-style sample_shape tuple."""
        if isinstance(num, (tuple, list)):
            out = 1
            for d in num:
                out *= int(d)
            return out
        return int(num)

    # -- sampling -------------------------------------------------------------

    def _dim_orders(self, dth: int):
        """Deterministic AR factorization orders for order-ensembling:
        identity first, then seeded permutations — fixed across calls so
        sample() and log_prob() mix the same set of factorizations."""
        orders = [jnp.arange(dth)]
        for k in range(1, self.num_order_ensembles):
            orders.append(
                jax.random.permutation(
                    jax.random.fold_in(jax.random.PRNGKey(714), k), dth
                )
            )
        return orders

    def _raw_sample(self, rng, x_o: Array, num: int, theta_ctx, x_ctx, ctx_mask,
                    model: Optional[TabICAModel] = None):
        """One fixed-shape proposal draw of `num` samples for one obs."""
        model = self.model if model is None else model
        q = _round_up(num, self.qry_chunk)
        x_qry = jnp.broadcast_to(x_o, (q, x_o.shape[-1]))
        if self.num_ensembles > 1:
            tc, xc, cm = split_context_ensemble(
                theta_ctx, x_ctx, ctx_mask, self.num_ensembles
            )
            theta, lp = autoregressive_sample_ensemble(
                model, tc, xc, cm, x_qry, rng, self.qry_chunk,
                self.target_transform,
            )
        elif self.num_order_ensembles > 1:
            # Equal-weight mixture over AR factorization orders: each order
            # samples its share of the draw; parts are interleaved so a
            # trimmed tail stays balanced across orders. Per-row log-probs
            # are the density under that row's own factorization.
            orders = self._dim_orders(theta_ctx.shape[1])
            per = _round_up(-(-num // len(orders)), self.qry_chunk)
            xq = jnp.broadcast_to(x_o, (per, x_o.shape[-1]))
            ts, ls = [], []
            for k_i, od in enumerate(orders):
                t, l = autoregressive_sample(
                    model, theta_ctx, x_ctx, ctx_mask, xq,
                    jax.random.fold_in(rng, k_i), self.qry_chunk,
                    self.target_transform, dim_order=od,
                )
                ts.append(t)
                ls.append(l)
            theta = jnp.stack(ts, axis=1).reshape(-1, ts[0].shape[-1])
            lp = jnp.stack(ls, axis=1).reshape(-1)
        else:
            theta, lp = autoregressive_sample(
                model, theta_ctx, x_ctx, ctx_mask, x_qry, rng,
                self.qry_chunk, self.target_transform,
            )
        return theta[:num], lp[:num]

    def _draw_group(self, rng, x: Array, n_over: int, ctx,
                    model: Optional[TabICAModel] = None):
        """Draw ``n_over`` proposals for EACH of m observations in one kernel
        pass, honoring the configured ensemble mode — the heterogeneous-rows
        analog of ``_raw_sample`` (batched APIs sample the same distribution
        as single-obs ``sample()`` for any ensemble config).

        With order-ensembling the per-obs pool interleaves the K orders so
        rejection trims and escape-hatch fills stay balanced across the
        mixture; callers align ``n_over`` to a multiple of
        ``num_order_ensembles``. Returns (theta [m,n_over,dθ], lp [m,n_over])
        where lp is each row's density under its own factorization (order
        path) or the member-mixture density (context-split path), matching
        ``_raw_sample``.
        """
        model = self.model if model is None else model
        theta_ctx, x_ctx, ctx_mask = ctx
        m, dx = x.shape
        dth = theta_ctx.shape[-1]

        def rows(per, key, sampler):
            q = _round_up(m * per, self.qry_chunk)
            x_qry = jnp.repeat(x, per, axis=0)
            x_qry = jnp.concatenate(
                [x_qry, jnp.zeros((q - m * per, dx), x.dtype)], axis=0
            )
            t, l = sampler(x_qry, key)
            return (
                t[: m * per].reshape(m, per, dth),
                l[: m * per].reshape(m, per),
            )

        if self.num_ensembles > 1:
            tc, xc, cm = split_context_ensemble(
                theta_ctx, x_ctx, ctx_mask, self.num_ensembles
            )
            return rows(
                n_over, rng,
                lambda xq, k: autoregressive_sample_ensemble(
                    model, tc, xc, cm, xq, k, self.qry_chunk,
                    self.target_transform,
                ),
            )
        if self.num_order_ensembles > 1:
            orders = self._dim_orders(dth)
            assert n_over % len(orders) == 0
            per = n_over // len(orders)
            ts, ls = [], []
            for k_i, od in enumerate(orders):
                t, l = rows(
                    per, jax.random.fold_in(rng, k_i),
                    lambda xq, k, od=od: autoregressive_sample(
                        model, theta_ctx, x_ctx, ctx_mask, xq, k,
                        self.qry_chunk, self.target_transform, dim_order=od,
                    ),
                )
                ts.append(t)
                ls.append(l)
            theta = jnp.stack(ts, axis=2).reshape(m, n_over, dth)
            lp = jnp.stack(ls, axis=2).reshape(m, n_over)
            return theta, lp
        return rows(
            n_over, rng,
            lambda xq, k: autoregressive_sample(
                model, theta_ctx, x_ctx, ctx_mask, xq, k, self.qry_chunk,
                self.target_transform,
            ),
        )

    def _within_support(self, theta: Array) -> Array:
        """Prior-support mask (npe_pfn.py:581-600); everything accepted when
        no prior is set."""
        if self.prior is None:
            return jnp.ones(theta.shape[:-1], bool)
        return self.prior.support_check(theta)

    def _fused_rejection(self, num_samples: int, batch: int, max_iters: int):
        """Build (and cache) a one-dispatch rejection sampler.

        The python-level driver in ``rejection.accept_reject_sample`` costs
        ~10 small dispatches plus one host sync per iteration; on the
        remote-TPU tunnel each round trip is tens of milliseconds — measured
        at ~30% of serving wall time (results/probe_v4_early.json). Here the
        ENTIRE loop — draw → support mask → stable partition → accumulate →
        escape-hatch fill (reference accept_reject_sampler.py:48-91) — is a
        single jitted ``lax.while_loop``, so ``sample()`` is one XLA
        dispatch. The prior rides along as a traced flax pytree argument, so
        nothing is baked into the executable and one compile serves every
        observation/context.

        Cache key = everything static that shapes the trace; jax.jit's own
        cache handles context-shape variation beneath it.
        """
        key = (
            num_samples, batch, max_iters, self.qry_chunk,
            self.target_transform, self.num_ensembles,
            self.num_order_ensembles, self.prior is None,
        )
        fn = self._fused_rej_cache.get(key)
        if fn is not None:
            return fn

        prior_is_none = self.prior is None
        # Slack: loop writes land at offsets < num_samples (length `batch`);
        # the unconditional post-loop fill writes `num_samples` rows at
        # offset `filled` <= num_samples.
        slack = num_samples + max(batch, num_samples)
        reps = -(-num_samples // batch)

        def run(model, prior, theta_ctx, x_ctx, ctx_mask, x_o, rng):
            dth = theta_ctx.shape[1]
            acc_s0 = jnp.zeros((slack, dth), jnp.float32)
            acc_lp0 = jnp.zeros((slack,), jnp.float32)
            last_s0 = jnp.zeros((batch, dth), jnp.float32)
            last_lp0 = jnp.zeros((batch,), jnp.float32)
            i0 = jnp.int32(0)

            def cond(c):
                it, filled = c[0], c[1]
                return (filled < num_samples) & (it < max_iters)

            def body(c):
                it, filled, acc_s, acc_lp, _ls, _ll, _lna, tot = c
                k = jax.random.fold_in(rng, it)
                s, lp = self._raw_sample(
                    k, x_o, batch, theta_ctx, x_ctx, ctx_mask, model=model
                )
                mask = (
                    jnp.ones((batch,), bool) if prior_is_none
                    else prior.support_check(s)
                )
                order = jnp.argsort(jnp.logical_not(mask), stable=True)
                s_sorted = jnp.take(s, order, axis=0)
                lp_sorted = jnp.take(lp, order, axis=0)
                n_acc = jnp.sum(mask, dtype=jnp.int32)
                acc_s = jax.lax.dynamic_update_slice_in_dim(
                    acc_s, s_sorted, filled, axis=0
                )
                acc_lp = jax.lax.dynamic_update_slice_in_dim(
                    acc_lp, lp_sorted, filled, axis=0
                )
                take = jnp.minimum(n_acc, jnp.int32(num_samples) - filled)
                return (
                    it + 1, filled + take, acc_s, acc_lp,
                    s_sorted, lp_sorted, n_acc, tot + n_acc,
                )

            it, filled, acc_s, acc_lp, last_s, last_lp, last_na, tot = (
                jax.lax.while_loop(
                    cond, body,
                    (i0, i0, acc_s0, acc_lp0, last_s0, last_lp0, i0, i0),
                )
            )
            # Escape hatch (accept_reject_sampler.py:74-77): unconditionally
            # write the last batch's UNUSED rows at the fill offset — in the
            # shortfall case the loop consumed every accepted row of the
            # final batch, so rotating the sorted batch past n_acc (rejected
            # rows first) never duplicates a returned sample unless the
            # deficit exceeds the rejected count. When the loop filled
            # everything this only touches junk rows beyond num_samples.
            roll = (jnp.arange(batch) + last_na) % batch
            rolled_s = jnp.take(last_s, roll, axis=0)
            rolled_lp = jnp.take(last_lp, roll, axis=0)
            fill_s = jnp.concatenate([rolled_s] * reps, axis=0)[:num_samples]
            fill_lp = jnp.concatenate([rolled_lp] * reps, axis=0)[:num_samples]
            acc_s = jax.lax.dynamic_update_slice_in_dim(
                acc_s, fill_s, filled, axis=0
            )
            acc_lp = jax.lax.dynamic_update_slice_in_dim(
                acc_lp, fill_lp, filled, axis=0
            )
            acceptance = tot.astype(jnp.float32) / (
                jnp.maximum(it, 1).astype(jnp.float32) * batch
            )
            return acc_s[:num_samples], acc_lp[:num_samples], acceptance

        fn = jax.jit(run)
        self._fused_rej_cache[key] = fn
        return fn

    def _fused_batched_rejection(self, num_samples: int, n_over: int,
                                 max_iters: int):
        """Build (and cache) a one-dispatch BATCHED rejection sampler.

        The vmap of ``_fused_rejection``'s loop over observations: each
        iteration draws ``n_over`` proposals per obs in one flat kernel
        pass, stable-partitions accepted rows to the front per obs, and
        writes them at per-obs fill offsets (vmapped
        ``dynamic_update_slice``). The whole multi-observation loop —
        including the per-obs escape hatch — is one jitted
        ``lax.while_loop``, so ``sample_batched`` costs one XLA dispatch
        per obs-chunk instead of per-iteration [m, n_over, dθ] D2H copies
        plus a python loop over observations (the reference's chunked host
        loop: evaluate_ropefm_batched.py:618-661, npe_pfn.py:369-397).

        Escape hatch per obs (reference accept_reject_sampler.py:74-77):
        a still-short observation takes its final batch's unused rows —
        on its last iteration every accepted row was consumed, so "unused"
        is exactly the sorted batch rotated past ``n_acc`` (rejected rows
        first), tiled to cover the deficit.
        """
        key = (
            "batched", num_samples, n_over, max_iters, self.qry_chunk,
            self.target_transform, self.prior is None,
            self.num_ensembles, self.num_order_ensembles,
        )
        fn = self._fused_rej_cache.get(key)
        if fn is not None:
            return fn

        prior_is_none = self.prior is None
        slack = num_samples + max(n_over, num_samples)
        reps = -(-num_samples // n_over)
        write = jax.vmap(
            lambda A, rows, off: jax.lax.dynamic_update_slice_in_dim(
                A, rows, off, axis=0
            )
        )

        def run(model, prior, theta_ctx, x_ctx, ctx_mask, x, rng):
            m, dx = x.shape
            dth = theta_ctx.shape[1]

            def draw(k):
                return self._draw_group(
                    k, x, n_over, (theta_ctx, x_ctx, ctx_mask), model=model
                )

            acc_s0 = jnp.zeros((m, slack, dth), jnp.float32)
            acc_lp0 = jnp.zeros((m, slack), jnp.float32)
            last_s0 = jnp.zeros((m, n_over, dth), jnp.float32)
            last_lp0 = jnp.zeros((m, n_over), jnp.float32)
            last_na0 = jnp.zeros((m,), jnp.int32)
            filled0 = jnp.zeros((m,), jnp.int32)
            i0 = jnp.int32(0)

            def cond(c):
                it, filled = c[0], c[1]
                return jnp.any(filled < num_samples) & (it < max_iters)

            def body(c):
                it, filled, acc_s, acc_lp, _ls, _ll, _lna, tot = c
                k = jax.random.fold_in(rng, it)
                s, lp = draw(k)
                if prior_is_none:
                    mask = jnp.ones((m, n_over), bool)
                else:
                    mask = prior.support_check(
                        s.reshape(-1, dth)
                    ).reshape(m, n_over)
                order = jnp.argsort(
                    jnp.logical_not(mask), axis=1, stable=True
                )
                s_sorted = jnp.take_along_axis(s, order[..., None], axis=1)
                lp_sorted = jnp.take_along_axis(lp, order, axis=1)
                n_acc = jnp.sum(mask, axis=1, dtype=jnp.int32)
                acc_s = write(acc_s, s_sorted, filled)
                acc_lp = write(acc_lp, lp_sorted, filled)
                take = jnp.minimum(n_acc, jnp.int32(num_samples) - filled)
                return (
                    it + 1, filled + take, acc_s, acc_lp,
                    s_sorted, lp_sorted, n_acc, tot + jnp.sum(n_acc),
                )

            it, filled, acc_s, acc_lp, last_s, last_lp, last_na, tot = (
                jax.lax.while_loop(
                    cond, body,
                    (i0, filled0, acc_s0, acc_lp0, last_s0, last_lp0,
                     last_na0, i0),
                )
            )
            # Rotate each obs's final sorted batch so unused (rejected)
            # rows come first, tile to num_samples, write at the fill
            # offset. For filled observations this lands at offset
            # num_samples — junk beyond the returned slice.
            idx = (jnp.arange(n_over)[None, :] + last_na[:, None]) % n_over
            rolled_s = jnp.take_along_axis(last_s, idx[..., None], axis=1)
            rolled_lp = jnp.take_along_axis(last_lp, idx, axis=1)
            fill_s = jnp.concatenate([rolled_s] * reps, axis=1)[
                :, :num_samples
            ]
            fill_lp = jnp.concatenate([rolled_lp] * reps, axis=1)[
                :, :num_samples
            ]
            acc_s = write(acc_s, fill_s, filled)
            acc_lp = write(acc_lp, fill_lp, filled)
            topped_up = jnp.maximum(jnp.int32(num_samples) - filled, 0)
            n_drawn = it * jnp.int32(m * n_over)
            return (
                acc_s[:, :num_samples], acc_lp[:, :num_samples],
                topped_up, tot, n_drawn,
            )

        fn = jax.jit(run)
        self._fused_rej_cache[key] = fn
        return fn

    def sample(
        self,
        num_samples,
        x: Array,
        rng: Optional[jax.Array] = None,
        max_iters: int = 10,
        show_progress: Optional[bool] = None,
        return_acceptance_rate: bool = False,
        return_log_probs: bool = False,
        with_log_prob: bool = False,
        max_sampling_batch_size: int = 10_000,
    ):
        """Posterior samples for ONE observation with rejection against the
        prior support (npe_pfn.py:253-308 + accept_reject_sampler.py:9-91).
        max_sampling_batch_size caps the per-iteration proposal draw like the
        reference (npe_pfn.py:257).

        Fixed-shape batches: every iteration draws the same padded batch, so
        the kernel compiles once. After max_iters the remainder is filled
        with unfiltered samples — the reference's documented escape hatch
        (accept_reject_sampler.py:74-77) — and the acceptance rate is
        reported so callers can detect it.

        Log-prob caveat: with ``num_order_ensembles > 1`` the returned
        per-row log-probs are each row's density under its OWN sampled
        factorization order, not the K-order mixture that ``log_prob()``
        evaluates. Consumers that need the actual proposal density
        (importance weights, threshold calibration) must re-score via
        ``log_prob()`` — PosteriorSupport does (support.py).
        """
        num_samples = self._num_from_shape(num_samples)
        if max_iters < 1:
            raise ValueError("max_iters must be >= 1")
        return_log_probs = return_log_probs or with_log_prob
        show_progress = (
            self.show_progress_bars if show_progress is None else show_progress
        )
        x = self._prep_obs(x)
        if x.ndim == 2:
            if x.shape[0] != 1:
                raise ValueError(
                    "sample() takes a single observation; use sample_batched "
                    "for multiple x (reference npe_pfn.py:278-282)"
                )
            x = x[0]
        rng = self._next_rng(rng)
        ctx_rng, rng = jax.random.split(rng)
        theta_ctx, x_ctx, ctx_mask = self.get_context(x, ctx_rng)

        # Align the proposal batch to qry_chunk multiples: _raw_sample pads
        # its query rows up to the next chunk boundary anyway, so drawing the
        # padded size costs the same kernel pass but yields every computed
        # row. Without this, sample(10_240) with the 10_000 cap accepted
        # 10_000 rows on iteration 1 and burned a second full pass on the
        # final 240 (round-2 bench regression).
        batch = _round_up(
            min(num_samples, max_sampling_batch_size), self.qry_chunk
        )
        if show_progress or os.environ.get("NPE_PFN_TPU_FUSED", "1") == "0":
            # Host-driven loop: progress callbacks need per-iteration
            # control on the host (and the env var is the escape valve if
            # the fused while_loop ever misbehaves on a new runtime).
            from .rejection import accept_reject_sample

            theta_out, lp_out, acceptance = accept_reject_sample(
                rng,
                proposal_fn=lambda k, n: self._raw_sample(
                    k, x, n, theta_ctx, x_ctx, ctx_mask
                ),
                accept_reject_fn=self._within_support,
                num_samples=num_samples,
                batch_size=batch,
                max_iters=max_iters,
                show_progress=show_progress,
            )
        else:
            run = self._fused_rejection(num_samples, batch, max_iters)
            theta_out, lp_out, acceptance_dev = run(
                self.model, self.prior, theta_ctx, x_ctx, ctx_mask, x, rng
            )
            # Sync the scalar only if the caller asked for it.
            acceptance = (
                float(acceptance_dev) if return_acceptance_rate else None
            )
        out = [theta_out]
        if return_log_probs:
            out.append(lp_out)
        if return_acceptance_rate:
            out.append(acceptance)
        return out[0] if len(out) == 1 else tuple(out)

    def sample_refined(
        self,
        num_samples,
        x: Array,
        simulator: Callable[[jax.Array, Array], Array],
        rng: Optional[jax.Array] = None,
        num_proposals: Optional[int] = None,
        eps: Optional[float] = None,
        eps_quantile: float = 0.02,
        kernel: str = "gaussian",
        importance_correct: bool = False,
        max_iters: int = 10,
        max_sampling_batch_size: int = 10_000,
    ) -> Array:
        """Posterior-predictive (ABC-SIR) refinement of amortized samples.

        Beyond-reference capability motivated by the measured failure mode
        of the in-context posterior on thin multimodal tasks
        (results/diagnosis_symfold_transfer.json): the amortized posterior
        allocates mass to the right modes but smears them locally. Since the
        SBI setting provides the simulator at inference (the reference
        already assumes this for sequential rounds, tsnpe_pfn.py:40-77),
        each proposal θᵢ can be scored by how well its own simulation
        matches the observation — sampling-importance-resampling with an
        ABC kernel, using the amortized posterior as the proposal:

          1. draw P proposals from the amortized posterior (one fused call),
          2. simulate xᵢ = simulator(kᵢ, θᵢ) for each (vmapped, on device),
          3. weight wᵢ ∝ K((‖(xᵢ−x_o)/sd_x‖)/ε), resample ``num_samples``.

        As ε → the simulator's intrinsic noise scale this converges to the
        exact posterior restricted to the proposal's support. Measured
        budget-matched deltas live in ``scripts/refine_quality.py`` /
        ``results/refine_quality.json`` (the committed probe before that
        run: two_moons C2ST 0.898 amortized, results/probe_two_moons_v6mid
        .json). Cost: ``num_proposals`` extra simulator calls; report
        budgets accordingly (this is NOT a free-quality knob — it trades
        simulations for precision, the same currency as TSNPE rounds).

        kernel: "gaussian" (soft weights, default) or "hard" (uniform over
        d ≤ ε — classic rejection-ABC).

        importance_correct: also multiply weights by prior(θ)/q(θ) with q
        the AR log_prob, which makes the ε→0 limit exactly the ABC
        posterior rather than q·K. Off by default: the AR density's own
        error adds weight variance, and the proposal-as-is target (q·K)
        is the quantity the harness scores (see
        results/refine_quality.json for the measured comparison).

        ``simulator`` must be a pure ``sim(key, theta) -> x``; if it is
        jax-traceable it runs as one jitted vmap on device (the compiled
        callable is cached per simulator object, so repeated calls don't
        retrace); otherwise it silently falls back to a host-side Python
        loop (numpy/scipy simulators work, like the reference's un-jitted
        simulate_for_sbi, tsnpe_pfn.py:40-77 — just slower).

        Diagnostics land in ``self.last_refine_diagnostics`` (ess, eps,
        num_proposals).
        """
        num_samples = self._num_from_shape(num_samples)
        if kernel not in ("gaussian", "hard"):
            raise ValueError("kernel must be 'gaussian' or 'hard'")
        if self._x_train is None:
            raise RuntimeError("call append_simulations before sample_refined")
        if num_proposals is None:
            num_proposals = max(8 * num_samples, 8192)
        rng = self._next_rng(rng)
        k_prop, k_sim, k_res = jax.random.split(rng, 3)

        proposals = self.sample(
            num_proposals, x, rng=k_prop, max_iters=max_iters,
            max_sampling_batch_size=max_sampling_batch_size,
        )

        x_o = self._prep_obs(x)
        if x_o.ndim == 2:
            x_o = x_o[0]
        sim_keys = jax.random.split(k_sim, num_proposals)
        x_sim = self._run_simulator(simulator, sim_keys, proposals)
        x_sim = jnp.asarray(x_sim, jnp.float32)
        if self.embedding_net is not None:
            # Mirror _prep_obs: shaped inputs (e.g. CNN embeddings for image
            # tasks) must reach the embedding net in their declared x_shape,
            # not flattened (round-4 advisor finding).
            if self.x_shape is not None:
                x_sim = x_sim.reshape(-1, *self.x_shape)
            else:
                x_sim = x_sim.reshape(num_proposals, -1)
            x_sim = jnp.asarray(self.embedding_net(x_sim))
        x_sim = x_sim.reshape(num_proposals, -1)
        # z-scored distance in the same units the context filter uses
        sd_x = jnp.maximum(jnp.std(self._x_train, axis=0), 1e-6)
        d = jnp.linalg.norm((x_sim - x_o[None, :]) / sd_x, axis=-1)

        eps_val = jnp.quantile(d, eps_quantile) if eps is None else jnp.asarray(eps)
        eps_val = jnp.maximum(eps_val, 1e-8)
        if kernel == "gaussian":
            logw = -0.5 * (d / eps_val) ** 2
        else:
            logw = jnp.where(d <= eps_val, 0.0, -jnp.inf)
        if importance_correct:
            logq = self.log_prob(
                proposals, x, mode="autoregressive",
                max_sampling_batch_size=max_sampling_batch_size,
            )
            logw = logw + self.prior.log_prob(proposals) - logq
        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
        # Degenerate guard: all weights -inf (hard kernel with eps below
        # every distance) falls back to uniform over proposals.
        all_dead = jnp.all(jnp.isinf(logw))
        logw = jnp.where(all_dead, jnp.zeros_like(logw), logw)

        w = jax.nn.softmax(logw)
        ess = 1.0 / jnp.sum(w**2)
        idx = jax.random.categorical(k_res, logw, shape=(num_samples,))
        refined = proposals[idx]
        self.last_refine_diagnostics = {
            "ess": float(ess),
            "eps": float(eps_val),
            "num_proposals": int(num_proposals),
            "min_distance": float(jnp.min(d)),
            "fallback_uniform": bool(all_dead),
        }
        return refined

    def sample_batched(
        self,
        num_samples,
        x: Array,
        rng: Optional[jax.Array] = None,
        max_iters: int = 10,
        oversample: float = 1.5,
        return_log_probs: bool = False,
        with_log_prob: bool = False,
        obs_chunk: int = 128,
    ):
        """Samples for M observations at once → [M, num_samples, dθ]
        (reference npe_pfn.py:310-410). Shared unfiltered context; query rows
        go through the scan in jitted calls of at most ``obs_chunk``
        observations each — the reference chunks its batched eval the same
        way (evaluate_ropefm_batched.py:618-661, batch_size=128) so that
        2000-obs grids stay within device memory.

        Unlike the reference — which can return short/raise after 10 tries
        (npe_pfn.py:400-402, SURVEY §3.2 edge) — undersupplied observations
        are topped up with unused draws from the final batch. Because
        ``n_over >= num_samples``, a short observation's final iteration
        consumed every in-support row, so the unused rows are exactly the
        rejected ones and the deficit can never exceed them: both drivers
        (fused and host) fill from the same population and never duplicate
        a returned row (tests/test_escape_hatch_parity.py). Per-obs top-up
        counts land in ``self.last_diagnostics["topped_up"]`` alongside the
        overall acceptance rate.
        """
        num_samples = self._num_from_shape(num_samples)
        if max_iters < 1:
            raise ValueError("max_iters must be >= 1")
        return_log_probs = return_log_probs or with_log_prob
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[None]
        if self.embedding_net is not None:
            x = self._prep_obs(x)
        m, dx = x.shape
        rng = self._next_rng(rng)

        # Shared context for all observations (filtering and batching are
        # mutually exclusive, npe_pfn.py:707). The reference feeds ALL sims
        # (npe_pfn.py:201-204); above the context budget we random-subsample
        # rather than silently truncating to the oldest rows.
        rng, ctx_rng = jax.random.split(rng)
        ctx = filters_mod.random_filtering(
            None, self._theta_train, self._x_train, self._effective_context_size,
            rng=ctx_rng,
        )

        use_fused = os.environ.get("NPE_PFN_TPU_FUSED", "1") != "0"
        if use_fused:
            n_over = int(
                math.ceil(
                    num_samples * (max(oversample, 1.0) if self.prior else 1.0)
                )
            )
            # Order-ensembled pools interleave the K orders (`_draw_group`).
            n_over = _round_up(n_over, self.num_order_ensembles)
            eff_iters = max_iters if self.prior is not None else 1
            run = self._fused_batched_rejection(num_samples, n_over, eff_iters)

        thetas, lps, topups, n_drawn, n_accepted = [], [], [], 0, 0
        for start in range(0, m, obs_chunk):
            rng, k = jax.random.split(rng)
            if use_fused:
                theta_ctx, x_ctx, ctx_mask = ctx
                t, l, tu, na_dev, nd_dev = run(
                    self.model, self.prior, theta_ctx, x_ctx, ctx_mask,
                    x[start : start + obs_chunk], k,
                )
                t, l, tu = np.asarray(t), np.asarray(l), np.asarray(tu)
                nd, na = int(nd_dev), int(na_dev)
            else:
                t, l, tu, nd, na = self._sample_batched_group(
                    k, x[start : start + obs_chunk], num_samples, max_iters,
                    oversample, ctx,
                )
            thetas.append(t)
            lps.append(l)
            topups.append(tu)
            n_drawn += nd
            n_accepted += na
        self.last_diagnostics = {
            "topped_up": np.concatenate(topups),
            "acceptance_rate": n_accepted / max(n_drawn, 1),
        }
        theta_out = jnp.asarray(np.concatenate(thetas, axis=0))
        lp_out = jnp.asarray(np.concatenate(lps, axis=0))
        return (theta_out, lp_out) if return_log_probs else theta_out

    def _sample_batched_group(
        self, rng, x: Array, num_samples: int, max_iters: int,
        oversample: float, ctx,
    ):
        """Rejection loop for one chunk of observations (shared context)."""
        theta_ctx, x_ctx, ctx_mask = ctx
        m, dx = x.shape
        oversample = max(oversample, 1.0)  # top-up fill requires n_over >= num
        n_over = int(math.ceil(num_samples * (oversample if self.prior else 1.0)))
        n_over = _round_up(n_over, self.num_order_ensembles)
        dth = self._theta_train.shape[1]
        got = [np.zeros((0, dth), np.float32) for _ in range(m)]
        got_lp = [np.zeros((0,), np.float32) for _ in range(m)]
        taken = None
        n_drawn, n_accepted = 0, 0
        for _ in range(max_iters):
            if min(g.shape[0] for g in got) >= num_samples:
                break
            rng, draw_rng = jax.random.split(rng)
            theta, lp = self._draw_group(
                draw_rng, x, n_over, (theta_ctx, x_ctx, ctx_mask)
            )
            theta = np.asarray(theta)
            lp = np.asarray(lp)
            mask = np.asarray(
                self._within_support(jnp.asarray(theta.reshape(-1, dth)))
            ).reshape(m, n_over)
            n_drawn += mask.size
            n_accepted += int(mask.sum())
            taken = []
            for j in range(m):
                take = np.nonzero(mask[j])[0][: num_samples - got[j].shape[0]]
                got[j] = np.concatenate([got[j], theta[j, take]], axis=0)
                got_lp[j] = np.concatenate([got_lp[j], lp[j, take]], axis=0)
                taken.append(take)
            if self.prior is None:
                break
        topped_up = np.zeros((m,), np.int64)
        for j in range(m):
            short = num_samples - got[j].shape[0]
            if short > 0:
                # Escape hatch (reference accept_reject_sampler.py:74-77):
                # fill from the final draw's UNUSED rows, never duplicating
                # taken rows. The in-support-first ordering below is
                # provably vacuous for a short obs (its final iteration
                # consumed every in-support row, so unused == rejected —
                # the same population the fused driver's rotation fills
                # from; tests/test_escape_hatch_parity.py) and is kept only
                # for clarity of intent.
                unused = np.setdiff1d(np.arange(n_over), taken[j], assume_unique=False)
                order = np.argsort(~mask[j][unused], kind="stable")  # in-support first
                fill = unused[order][:short]
                got[j] = np.concatenate([got[j], theta[j, fill]], axis=0)
                got_lp[j] = np.concatenate([got_lp[j], lp[j, fill]], axis=0)
                topped_up[j] = short
        theta_out = np.stack(got)[:, :num_samples]
        lp_out = np.stack(got_lp)[:, :num_samples]
        return theta_out, lp_out, topped_up, n_drawn, n_accepted

    def sample_batched_filtered(
        self,
        num_samples,
        x: Array,
        rng: Optional[jax.Array] = None,
        obs_chunk: int = 8,
        return_log_probs: bool = False,
    ):
        """Batched sampling WITH per-observation filtered contexts.

        The reference documents this as impossible — "can never support
        batched sampling with filtering because the context depends on x"
        (npe_pfn.py:707). With a pure-functional model it is just a vmap
        over per-observation contexts: each observation gets its own
        filtered context, encoded and sampled in parallel on device.

        No prior rejection here (vmapped fixed shapes); apply
        `_within_support` downstream if needed. Returns [M, num_samples, dθ].
        """
        num_samples = self._num_from_shape(num_samples)
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[None]
        if self.embedding_net is not None:
            x = self._prep_obs(x)
        m, dx = x.shape
        rng = self._next_rng(rng)
        # Choose the chunk first, then pad the sample count to a chunk
        # multiple — autoregressive_sample requires q % chunk == 0, and
        # e.g. num_samples=1280 with qry_chunk=1024 would otherwise yield
        # s_pad=1280, chunk=1024 and trip its assertion. With order
        # ensembles each of the K orders draws its own padded share and the
        # shares are interleaved before the trim (same mixture as sample()).
        n_orders = self.num_order_ensembles
        per_raw = -(-num_samples // n_orders)
        chunk = min(self.qry_chunk, _round_up(per_raw, 256))
        s_pad = _round_up(per_raw, chunk)

        if self.num_ensembles > 1:
            num_members = self.num_ensembles
            vmapped = jax.vmap(
                lambda tc, xc, cm, xq, k: autoregressive_sample_ensemble(
                    self.model,
                    *split_context_ensemble(tc, xc, cm, num_members),
                    xq, k, chunk, self.target_transform,
                )
            )

            def draw(ctxs, xq, keys):
                return vmapped(*ctxs, xq, keys)
        elif n_orders > 1:
            vm = [
                jax.vmap(
                    lambda tc, xc, cm, xq, k, od=od: autoregressive_sample(
                        self.model, tc, xc, cm, xq, k, chunk,
                        self.target_transform, dim_order=od,
                    )
                )
                for od in self._dim_orders(self._theta_train.shape[1])
            ]

            def draw(ctxs, xq, keys):
                ts, ls = [], []
                for k_i, f in enumerate(vm):
                    ks = jax.vmap(lambda kk: jax.random.fold_in(kk, k_i))(keys)
                    t, l = f(*ctxs, xq, ks)
                    ts.append(t)
                    ls.append(l)
                g = ts[0].shape[0]
                theta = jnp.stack(ts, axis=2).reshape(g, s_pad * len(vm), -1)
                lp = jnp.stack(ls, axis=2).reshape(g, s_pad * len(vm))
                return theta, lp
        else:
            vmapped = jax.vmap(
                lambda tc, xc, cm, xq, k: autoregressive_sample(
                    self.model, tc, xc, cm, xq, k, chunk, self.target_transform
                )
            )

            def draw(ctxs, xq, keys):
                return vmapped(*ctxs, xq, keys)

        outs, lps = [], []
        for start in range(0, m, obs_chunk):
            stop = min(start + obs_chunk, m)
            ctxs = []
            for j in range(start, stop):
                rng, k_f = jax.random.split(rng)
                ctxs.append(self.get_context(x[j], k_f))
            theta_ctx = jnp.stack([c[0] for c in ctxs])
            x_ctx = jnp.stack([c[1] for c in ctxs])
            ctx_mask = jnp.stack([c[2] for c in ctxs])
            x_qry = jnp.broadcast_to(
                x[start:stop, None, :], (stop - start, s_pad, dx)
            )
            rng, k_d = jax.random.split(rng)
            keys = jax.random.split(k_d, stop - start)
            theta, lp = draw((theta_ctx, x_ctx, ctx_mask), x_qry, keys)
            outs.append(theta[:, :num_samples])
            lps.append(lp[:, :num_samples])
        theta_out = jnp.concatenate(outs, axis=0)
        lp_out = jnp.concatenate(lps, axis=0)
        return (theta_out, lp_out) if return_log_probs else theta_out

    # -- densities ------------------------------------------------------------

    def log_prob(
        self,
        theta: Array,
        x: Array,
        rng: Optional[jax.Array] = None,
        mode: Optional[str] = None,
        num_ratio_samples: int = 4096,
        padding: float = 0.1,
        max_sampling_batch_size: int = 10_000,
    ) -> Array:
        """log q(θ|x) — autoregressive or ratio_based (npe_pfn.py:412-455).
        θ is scored in chunks of ``max_sampling_batch_size`` rows (reference
        npe_pfn.py:436) so 100k-θ evaluations stay within chip memory."""
        mode = mode or self.log_prob_mode
        theta = self._validate(jnp.asarray(theta, jnp.float32), "theta")
        x_raw = x  # sample() runs _prep_obs itself; pass the raw observation
        x = self._prep_obs(x)
        if x.ndim == 2:
            x = x[0]
        rng = self._next_rng(rng)
        if mode == "autoregressive":
            ctx_rng, rng = jax.random.split(rng)
            theta_ctx, x_ctx, ctx_mask = self.get_context(x, ctx_rng)
            if self.num_ensembles > 1:
                tc, xc, cm = split_context_ensemble(
                    theta_ctx, x_ctx, ctx_mask, self.num_ensembles
                )
            n = theta.shape[0]
            cap = _round_up(max_sampling_batch_size, self.qry_chunk)
            out = []
            for start in range(0, n, cap):
                chunk = theta[start : start + cap]
                nc = chunk.shape[0]
                q = _round_up(nc, self.qry_chunk)
                x_qry = jnp.broadcast_to(x, (q, x.shape[-1]))
                theta_pad = jnp.concatenate(
                    [chunk, jnp.zeros((q - nc, chunk.shape[1]), chunk.dtype)], axis=0
                )
                if self.num_ensembles > 1:
                    lp = autoregressive_log_prob_ensemble(
                        self.model, tc, xc, cm, x_qry, theta_pad, self.qry_chunk,
                        self.target_transform,
                    )
                elif self.num_order_ensembles > 1:
                    # Mixture density over factorization orders (matches the
                    # order-ensembled sampler): logsumexp_k lp_k − log K.
                    lps = jnp.stack([
                        autoregressive_log_prob(
                            self.model, theta_ctx, x_ctx, ctx_mask, x_qry,
                            theta_pad, self.qry_chunk, self.target_transform,
                            dim_order=od,
                        )
                        for od in self._dim_orders(theta_pad.shape[1])
                    ])
                    lp = jax.scipy.special.logsumexp(lps, axis=0) - math.log(
                        lps.shape[0]
                    )
                else:
                    lp = autoregressive_log_prob(
                        self.model, theta_ctx, x_ctx, ctx_mask, x_qry, theta_pad,
                        self.qry_chunk, self.target_transform,
                    )
                out.append(np.asarray(lp[:nc]))
            return jnp.asarray(np.concatenate(out, axis=0))
        if mode == "ratio_based":
            if self._ratio.refit_necessary(x, self._ctx_version, num_ratio_samples, padding):
                s_rng, f_rng, rng = jax.random.split(rng, 3)
                # x_raw, not x: sample() applies the embedding net itself —
                # passing the already-embedded x would embed twice (shape
                # crash, or silently wrong context filtering when dims match).
                post = self.sample(num_ratio_samples, x_raw, rng=s_rng)
                self._ratio.model = self.model
                self._ratio.fit(f_rng, post, x, self._ctx_version, padding)
            return self._ratio.ratio_log_probs(
                theta, chunk_size=max_sampling_batch_size
            )
        raise ValueError(f"unknown log_prob mode {mode!r}")

    def log_prob_batched(
        self,
        theta: Array,
        x: Array,
        rng: Optional[jax.Array] = None,
        max_sampling_batch_size: int = 10_000,
    ) -> Array:
        """Batched autoregressive log-prob over M observations —
        unimplemented in the reference (npe_pfn.py:457-460), free here.
        Rows are scored in chunks of ``max_sampling_batch_size`` (reference
        chunking semantics, npe_pfn.py:436).

        theta: [M, S, dθ]; x: [M, dx] → [M, S]. Ensemble configs score the
        same mixture density the ensembled sampler draws from (context-subset
        logsumexp / factorization-order logsumexp, as in ``log_prob``).
        """
        theta = jnp.asarray(theta, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        if self.embedding_net is not None:
            x = jnp.asarray(self.embedding_net(x))
        m, s, dth = theta.shape
        rng = self._next_rng(rng)
        rng, ctx_rng = jax.random.split(rng)
        theta_ctx, x_ctx, ctx_mask = filters_mod.random_filtering(
            None, self._theta_train, self._x_train, self._effective_context_size,
            rng=ctx_rng,
        )
        if self.num_ensembles > 1:
            tc, xc, cm = split_context_ensemble(
                theta_ctx, x_ctx, ctx_mask, self.num_ensembles
            )
        x_rows = jnp.repeat(x, s, axis=0)
        theta_rows = theta.reshape(m * s, dth)
        cap = _round_up(max_sampling_batch_size, self.qry_chunk)
        out = []
        for start in range(0, m * s, cap):
            xr = x_rows[start : start + cap]
            tr = theta_rows[start : start + cap]
            nc = xr.shape[0]
            q = _round_up(nc, self.qry_chunk)
            xr = jnp.concatenate(
                [xr, jnp.zeros((q - nc, x.shape[1]), x.dtype)], axis=0
            )
            tr = jnp.concatenate(
                [tr, jnp.zeros((q - nc, dth), theta.dtype)], axis=0
            )
            if self.num_ensembles > 1:
                lp = autoregressive_log_prob_ensemble(
                    self.model, tc, xc, cm, xr, tr, self.qry_chunk,
                    self.target_transform,
                )
            elif self.num_order_ensembles > 1:
                lps = jnp.stack([
                    autoregressive_log_prob(
                        self.model, theta_ctx, x_ctx, ctx_mask, xr, tr,
                        self.qry_chunk, self.target_transform, dim_order=od,
                    )
                    for od in self._dim_orders(dth)
                ])
                lp = jax.scipy.special.logsumexp(lps, axis=0) - math.log(
                    lps.shape[0]
                )
            else:
                lp = autoregressive_log_prob(
                    self.model, theta_ctx, x_ctx, ctx_mask, xr, tr,
                    self.qry_chunk, self.target_transform,
                )
            out.append(np.asarray(lp[:nc]))
        return jnp.asarray(np.concatenate(out, axis=0)).reshape(m, s)
