"""Functional regressor interface over the TabICA transformer.

This is the analog of the reference's use of ``TabPFNRegressor``:
``model.fit(X, y); pred = model.predict(X_q, output_type="full")`` returning
``{"criterion", "logits"}`` (reference: npe_pfn.py:140-146). In JAX, "fit" is
not training — it is binding context — so it becomes ``fit_encode`` (pure:
normalize + encode the context once) and prediction becomes pure functions of
the resulting cache. That split is what lets the per-dimension autoregressive
sampling loop live inside one ``lax.scan`` with the context encoded exactly
once per dimension (the reference pays M×dim_θ or dim_θ PyTorch fits;
see docs in SURVEY.md §3.1/3.2).

Normalization contract: features and targets are z-scored with context
statistics (masked rows excluded); the bar distribution operates in
normalized target space and densities are corrected by ``-log sd_y``.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from . import bar_distribution as bar
from . import transformer
from .config import TabICAConfig

_FEATURE_CLIP = 12.0
_MIN_STD = 1e-6


@flax.struct.dataclass
class TabICAModel:
    """Bundle of (static config, trained params, bar borders). A pytree —
    safe to close over or pass through jit/scan.

    ``temperature`` is a post-hoc calibration scalar (bar logits are divided
    by it at prediction, so τ>1 widens every conditional, τ<1 sharpens):
    one traced leaf fitted on held-out synthetic tasks by
    scripts/fit_temperature.py and baked into the shipped checkpoint —
    the principled single-knob fix for the SBC miscalibration measured in
    results/round6/sbc_two_moons.log. 1.0 (the default and the value in
    pre-round-5 checkpoints) is exactly the uncalibrated model. The
    pretraining loss reads raw transformer logits, so τ never affects
    training."""

    cfg: TabICAConfig = flax.struct.field(pytree_node=False)
    params: dict
    borders: jnp.ndarray
    temperature: jnp.ndarray = 1.0

    @classmethod
    def create(cls, rng: jax.Array, cfg: TabICAConfig) -> "TabICAModel":
        return cls(
            cfg=cfg,
            params=transformer.init_params(rng, cfg),
            borders=bar.make_borders(cfg.num_bars, cfg.bar_range),
        )


@flax.struct.dataclass
class ContextStats:
    mu_x: jnp.ndarray  # [..., F]
    sd_x: jnp.ndarray  # [..., F]
    mu_y: jnp.ndarray  # [...]
    sd_y: jnp.ndarray  # [...]


@flax.struct.dataclass
class FittedContext:
    """Everything predictions need: encoded cache + normalization stats."""

    cache: jnp.ndarray  # [L, ..., T, N, D]
    stats: ContextStats
    feat_mask: jnp.ndarray  # [..., F]
    ctx_mask: jnp.ndarray  # [..., N]


def compute_stats(
    x_ctx: jnp.ndarray,
    y_ctx: jnp.ndarray,
    ctx_mask: jnp.ndarray,
) -> ContextStats:
    w = ctx_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mu_x = jnp.sum(x_ctx * w[..., :, None], axis=-2) / denom[..., None]
    var_x = jnp.sum(jnp.square(x_ctx - mu_x[..., None, :]) * w[..., :, None], axis=-2) / denom[..., None]
    mu_y = jnp.sum(y_ctx * w, axis=-1) / denom
    var_y = jnp.sum(jnp.square(y_ctx - mu_y[..., None]) * w, axis=-1) / denom
    return ContextStats(
        mu_x=mu_x,
        sd_x=jnp.maximum(jnp.sqrt(var_x), _MIN_STD),
        mu_y=mu_y,
        sd_y=jnp.maximum(jnp.sqrt(var_y), _MIN_STD),
    )


def normalize_x(stats: ContextStats, x: jnp.ndarray) -> jnp.ndarray:
    z = (x - stats.mu_x[..., None, :]) / stats.sd_x[..., None, :]
    # Guard against context-constant features / far-out queries (the
    # reference's standardized filter has the same ε concern,
    # support_posterior.py:361-362 — fixed here by _MIN_STD + clipping).
    return jnp.clip(z, -_FEATURE_CLIP, _FEATURE_CLIP)


def normalize_y(stats: ContextStats, y: jnp.ndarray) -> jnp.ndarray:
    return (y - stats.mu_y[..., None]) / stats.sd_y[..., None]


def denormalize_y(stats: ContextStats, y: jnp.ndarray) -> jnp.ndarray:
    return y * stats.sd_y[..., None] + stats.mu_y[..., None]


def fit_encode(
    model: TabICAModel,
    x_ctx: jnp.ndarray,  # [N, F] raw features
    y_ctx: jnp.ndarray,  # [N]    raw targets
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
) -> FittedContext:
    """The ``fit`` analog: normalize + encode the context once."""
    n, f = x_ctx.shape[-2], x_ctx.shape[-1]
    if feat_mask is None:
        feat_mask = jnp.ones(x_ctx.shape[:-2] + (f,), bool)
    if ctx_mask is None:
        ctx_mask = jnp.ones(x_ctx.shape[:-2] + (n,), bool)
    stats = compute_stats(x_ctx, y_ctx, ctx_mask)
    xn = normalize_x(stats, x_ctx) * feat_mask[..., None, :]
    yn = normalize_y(stats, y_ctx) * ctx_mask
    cache = transformer.encode_context(model.cfg, model.params, xn, yn, feat_mask, ctx_mask)
    return FittedContext(cache=cache, stats=stats, feat_mask=feat_mask, ctx_mask=ctx_mask)


def predict_logits(
    model: TabICAModel, fitted: FittedContext, x_qry: jnp.ndarray
) -> jnp.ndarray:
    """Bar logits in *normalized* target space, [..., Q, num_bars],
    calibration-temperature applied (see TabICAModel.temperature)."""
    xq = normalize_x(fitted.stats, x_qry) * fitted.feat_mask[..., None, :]
    logits = transformer.decode_queries(
        model.cfg, model.params, fitted.cache, xq, fitted.feat_mask, fitted.ctx_mask
    )
    return logits / model.temperature


def sample_y(
    rng: jax.Array, model: TabICAModel, fitted: FittedContext, logits: jnp.ndarray
) -> jnp.ndarray:
    """criterion.sample analog (npe_pfn.py:146): draws in original space."""
    yn = bar.sample(rng, model.borders, logits)
    return yn * fitted.stats.sd_y + fitted.stats.mu_y


def log_prob_y(
    model: TabICAModel, fitted: FittedContext, logits: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """criterion NLL analog (npe_pfn.py:149-151), in original space:
    log p(y) = log p_norm((y-mu)/sd) - log sd."""
    yn = (y - fitted.stats.mu_y) / fitted.stats.sd_y
    return bar.log_prob(model.borders, logits, yn) - jnp.log(fitted.stats.sd_y)


def predict_mean(
    model: TabICAModel, fitted: FittedContext, logits: jnp.ndarray
) -> jnp.ndarray:
    mn = bar.mean(model.borders, logits)
    return mn * fitted.stats.sd_y + fitted.stats.mu_y


def predict_quantiles(
    model: TabICAModel,
    fitted: FittedContext,
    logits: jnp.ndarray,
    quantiles: jnp.ndarray,
) -> jnp.ndarray:
    """Posterior quantiles in original space — the TabPFN
    ``predict(..., quantiles=[...])`` contract (reference npe_pfn.py:144
    passes quantiles=[]). logits [..., B], quantiles [K] -> [..., K]."""
    q = jnp.asarray(quantiles)
    yn = jax.vmap(lambda qq: bar.icdf(model.borders, logits, qq), out_axes=-1)(q)
    return yn * fitted.stats.sd_y + fitted.stats.mu_y


# --- One-shot convenience (joint forward; used by tests and the classifier).


def predict_full(
    model: TabICAModel,
    x_ctx: jnp.ndarray,
    y_ctx: jnp.ndarray,
    x_qry: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
):
    """fit + predict in one call; returns (logits, fitted)."""
    fitted = fit_encode(model, x_ctx, y_ctx, feat_mask, ctx_mask)
    return predict_logits(model, fitted, x_qry), fitted


def predict_proba(
    model: TabICAModel,
    x_ctx: jnp.ndarray,
    labels: jnp.ndarray,  # [N] in {0, 1}
    x_qry: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Binary classifier analog of ``TabPFNClassifier.predict_proba``
    (reference: npe_pfn.py:697-702, restricted_prior.py:26-27).

    The posterior mean of a {0,1}-valued regression target is exactly
    P(y=1|x), so the regressor doubles as a calibrated binary classifier.
    Returns [..., Q, 2] probabilities (class 0, class 1).
    """
    logits, fitted = predict_full(model, x_ctx, labels.astype(jnp.float32), x_qry, feat_mask, ctx_mask)
    p1 = jnp.clip(predict_mean(model, fitted, logits), 1e-6, 1.0 - 1e-6)
    return jnp.stack([1.0 - p1, p1], axis=-1)


def predict_proba_multiclass(
    model: TabICAModel,
    x_ctx: jnp.ndarray,
    labels: jnp.ndarray,  # [N] ints in [0, num_classes)
    x_qry: jnp.ndarray,
    num_classes: int,
    feat_mask: Optional[jnp.ndarray] = None,
    ctx_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-class ``TabPFNClassifier.predict_proba`` analog (the reference's
    classifier is genuinely multi-class; npe_pfn.py:697-702 only ever uses
    two classes). One-vs-rest: K posterior-mean regressions on the indicator
    targets 1[label = k] — each is a calibrated estimate of P(y = k | x) —
    vmapped over classes and normalized. Returns [..., Q, num_classes]."""
    labels = labels.astype(jnp.int32)

    def one_class(k):
        y_k = (labels == k).astype(jnp.float32)
        logits, fitted = predict_full(model, x_ctx, y_k, x_qry, feat_mask, ctx_mask)
        return jnp.clip(predict_mean(model, fitted, logits), 1e-6, 1.0 - 1e-6)

    p = jax.vmap(one_class, out_axes=-1)(jnp.arange(num_classes))
    return p / jnp.sum(p, axis=-1, keepdims=True)
