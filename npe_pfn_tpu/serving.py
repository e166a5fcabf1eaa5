"""Serving layer: precomputed-context posteriors.

Production-serving observation: the per-dimension context encodings (the
"fit" analogs) depend only on the bound context — never on query rows or
previously sampled values. So for a fixed observation all dθ encodings can
be computed ONCE and every subsequent `sample` / `log_prob` call is
decode-only. This collapses the cost of repeat sampling (the reference
re-fits TabPFN per dimension on every call, npe_pfn.py:140) and makes the
classic serving pattern — one observation, many requests — cheap.

Also accelerates internals that hammer the same observation repeatedly:
PosteriorSupport's rejection rounds and the ratio-path's 4k-sample draw.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import preprocessing
from .estimator import NPEPFN, _eff_features, _round_up
from .models import regressor
from .models.regressor import FittedContext, TabICAModel

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("target_transform",))
def _precompute_dim_caches(
    model: TabICAModel,
    theta_ctx: Array,  # [N, dθ]
    x_ctx: Array,  # [N, dx]
    ctx_mask: Array,  # [N]
    target_transform: str = "zscore",
):
    """Encode the context once per θ-dimension; returns (FittedContext with
    a leading dθ axis, per-dim QuantileTransforms or None, per-column
    feature QuantileTransforms or None — the "+featq" spec, estimator.py
    autoregressive_sample)."""
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    n, dth = theta_ctx.shape
    dx = x_ctx.shape[1]
    f = _eff_features(model, dx, dth)  # exact slice, see estimator.py
    xc = jnp.zeros((n, f), theta_ctx.dtype)
    xc = xc.at[:, :dx].set(x_ctx).at[:, dx : dx + dth].set(theta_ctx)
    qts_f = None
    if feat_q:
        qts_f = preprocessing.quantile_fit_cols(xc, ctx_mask)
        xc = preprocessing.quantile_forward_cols(qts_f, xc)
    col = jnp.arange(f)
    feat_masks = col[None, :] < (dx + jnp.arange(dth))[:, None]  # [dθ, F]

    if target_transform == "quantile":
        qts = jax.vmap(lambda y: preprocessing.quantile_fit(y, ctx_mask))(
            theta_ctx.T
        )
        y_enc = jax.vmap(preprocessing.quantile_forward)(qts, theta_ctx.T)
    else:
        qts = None
        y_enc = theta_ctx.T

    fitted = jax.vmap(
        lambda y, fm: regressor.fit_encode(model, xc, y, fm, ctx_mask)
    )(y_enc, feat_masks)
    return fitted, qts, qts_f


@partial(jax.jit, static_argnames=("qry_chunk", "dx", "target_transform"))
def _cached_sample(
    model: TabICAModel,
    caches: FittedContext,  # leaves stacked over dθ
    qts,  # per-dim QuantileTransforms (leading dθ axis) or None
    qts_f,  # per-column feature QuantileTransforms or None ("+featq")
    x_qry: Array,  # [Q, dx]
    rng: jax.Array,
    qry_chunk: int,
    dx: int,
    target_transform: str = "zscore",
) -> Tuple[Array, Array]:
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    dth = caches.stats.mu_y.shape[0]
    q = x_qry.shape[0]
    f = caches.feat_mask.shape[-1]  # width chosen at precompute

    def step(theta_sm, inp):
        i, key = inp
        fitted = jax.tree_util.tree_map(lambda a: a[i], caches)
        xq = jnp.zeros((q, f), x_qry.dtype)
        xq = xq.at[:, :dx].set(x_qry).at[:, dx : dx + dth].set(theta_sm)
        if feat_q:
            xq = preprocessing.quantile_forward_cols(qts_f, xq)
        logits = jax.lax.map(
            lambda chunk: regressor.predict_logits(model, fitted, chunk),
            xq.reshape(q // qry_chunk, qry_chunk, f),
        ).reshape(q, -1)
        th_i = regressor.sample_y(key, model, fitted, logits)
        lp_i = regressor.log_prob_y(model, fitted, logits, th_i)
        if target_transform == "quantile":
            qt_i = jax.tree_util.tree_map(lambda a: a[i], qts)
            th_i = preprocessing.quantile_inverse(qt_i, th_i)
            lp_i = lp_i + preprocessing.quantile_log_det(qt_i, th_i)
        return theta_sm.at[:, i].set(th_i), lp_i

    keys = jax.random.split(rng, dth)
    theta0 = jnp.zeros((q, dth), x_qry.dtype)
    theta, lps = jax.lax.scan(step, theta0, (jnp.arange(dth), keys))
    return theta, jnp.sum(lps, axis=0)


@partial(jax.jit, static_argnames=("qry_chunk", "dx", "target_transform"))
def _cached_log_prob(
    model: TabICAModel,
    caches: FittedContext,
    qts,
    qts_f,
    x_qry: Array,
    theta_eval: Array,
    qry_chunk: int,
    dx: int,
    target_transform: str = "zscore",
) -> Array:
    target_transform, feat_q = preprocessing.parse_transform(target_transform)
    dth = caches.stats.mu_y.shape[0]
    q = x_qry.shape[0]
    f = caches.feat_mask.shape[-1]  # width chosen at precompute
    xq = jnp.zeros((q, f), x_qry.dtype)
    xq = xq.at[:, :dx].set(x_qry).at[:, dx : dx + dth].set(theta_eval)
    if feat_q:
        xq = preprocessing.quantile_forward_cols(qts_f, xq)
    chunks = xq.reshape(q // qry_chunk, qry_chunk, f)

    def step(_, i):
        fitted = jax.tree_util.tree_map(lambda a: a[i], caches)
        logits = jax.lax.map(
            lambda chunk: regressor.predict_logits(model, fitted, chunk), chunks
        ).reshape(q, -1)
        th_i = jnp.take(theta_eval, i, axis=1)
        if target_transform == "quantile":
            qt_i = jax.tree_util.tree_map(lambda a: a[i], qts)
            z_i = preprocessing.quantile_forward(qt_i, th_i)
            lp_i = regressor.log_prob_y(model, fitted, logits, z_i)
            lp_i = lp_i + preprocessing.quantile_log_det(qt_i, th_i)
        else:
            lp_i = regressor.log_prob_y(model, fitted, logits, th_i)
        return None, lp_i

    _, lps = jax.lax.scan(step, None, jnp.arange(dth))
    return jnp.sum(lps, axis=0)


class CachedPosterior:
    """A posterior bound to one observation with all dθ context encodings
    precomputed. `sample`/`log_prob` are decode-only."""

    def __init__(self, estimator: NPEPFN, x_o: Array, rng: Optional[jax.Array] = None):
        self.estimator = estimator
        x = estimator._prep_obs(jnp.asarray(x_o, jnp.float32))
        if x.ndim == 2:
            x = x[0]
        self.x_o = x
        rng = estimator._next_rng(rng)
        theta_ctx, x_ctx, ctx_mask = estimator.get_context(x, rng)
        self.dx = int(x_ctx.shape[1])
        self.dim_theta = int(theta_ctx.shape[1])
        self.caches, self.qts, self.qts_f = _precompute_dim_caches(
            estimator.model, theta_ctx, x_ctx, ctx_mask,
            estimator.target_transform,
        )

    def sample(
        self,
        num_samples: int,
        rng: Optional[jax.Array] = None,
        return_log_probs: bool = False,
    ):
        est = self.estimator
        rng = est._next_rng(rng)
        q = _round_up(num_samples, est.qry_chunk)
        x_qry = jnp.broadcast_to(self.x_o, (q, self.dx))
        theta, lp = _cached_sample(
            est.model, self.caches, self.qts, self.qts_f, x_qry, rng,
            est.qry_chunk, self.dx, est.target_transform,
        )
        theta, lp = theta[:num_samples], lp[:num_samples]
        return (theta, lp) if return_log_probs else theta

    def log_prob(self, theta: Array) -> Array:
        est = self.estimator
        theta = jnp.asarray(theta, jnp.float32)
        n = theta.shape[0]
        q = _round_up(n, est.qry_chunk)
        x_qry = jnp.broadcast_to(self.x_o, (q, self.dx))
        theta_pad = jnp.concatenate(
            [theta, jnp.zeros((q - n, theta.shape[1]), theta.dtype)], axis=0
        )
        lp = _cached_log_prob(
            est.model, self.caches, self.qts, self.qts_f, x_qry, theta_pad,
            est.qry_chunk, self.dx, est.target_transform,
        )
        return lp[:n]
