"""Full-support piecewise-constant ("bar") output distribution.

This is the TPU-native analog of the `criterion` object the reference pulls
out of TabPFN's full-prediction dict (reference: npe_pfn.py:140-151 uses
``pred["criterion"].sample(logits)`` and ``criterion(logits, y) -> NLL``).
Everything here is a pure function of ``(borders, logits, ...)`` so it can be
vmapped over query rows and scanned over autoregressive dimensions.

Construction: ``B`` buckets delimited by ``B+1`` finite borders placed at
equal-mass quantiles of a standard normal over ``[-range, range]`` (the model
operates in context-normalized target space, so a standard-normal layout is
the right default). The two edge buckets carry half-normal tails extending to
±inf, giving the distribution full support — required because rejection
sampling and ratio-based log_prob both evaluate densities at arbitrary points.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

_HALF_LOG_2_OVER_PI = 0.5 * math.log(2.0 / math.pi)
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def make_borders(num_bars: int, bar_range: float = 6.0) -> jnp.ndarray:
    """Equal-normal-mass borders: shape [num_bars + 1], spanning ±bar_range."""
    lo = jax.scipy.stats.norm.cdf(-bar_range)
    hi = jax.scipy.stats.norm.cdf(bar_range)
    probs = jnp.linspace(lo, hi, num_bars + 1)
    borders = jax.scipy.special.ndtri(probs)
    # Guard the endpoints exactly (ndtri is finite here but be explicit).
    return borders.at[0].set(-bar_range).at[-1].set(bar_range)


def _widths(borders: jnp.ndarray) -> jnp.ndarray:
    return borders[1:] - borders[:-1]


def _halfnorm_logpdf(dist: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """log pdf of |N(0, scale^2)| evaluated at dist >= 0."""
    return _HALF_LOG_2_OVER_PI - jnp.log(scale) - 0.5 * (dist / scale) ** 2


def log_prob(borders: jnp.ndarray, logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """log p(y) under the bar distribution.

    Args:
      borders: [B+1] bucket borders.
      logits:  [..., B] unnormalized bucket logits.
      y:       [...] evaluation points (broadcastable against logits[..., 0]).

    Returns:
      [...] log densities (finite everywhere thanks to the tail buckets).
    """
    num_bars = borders.shape[0] - 1
    widths = _widths(borders)
    batch = jnp.broadcast_shapes(logits.shape[:-1], jnp.shape(y))
    y = jnp.broadcast_to(y, batch)
    log_bucket_probs = jnp.broadcast_to(
        jax.nn.log_softmax(logits, axis=-1), batch + (num_bars,)
    )

    # Bucket index: interior borders are borders[1:-1]; values beyond the
    # extreme borders land in the tail buckets 0 / B-1.
    k = jnp.clip(jnp.searchsorted(borders[1:-1], y, side="right"), 0, num_bars - 1)
    log_pk = jnp.take_along_axis(log_bucket_probs, k[..., None], axis=-1)[..., 0]

    # Conditional density within the selected bucket.
    interior = -jnp.log(widths[k])
    lo_tail = _halfnorm_logpdf(jnp.maximum(borders[1] - y, 0.0), widths[0])
    hi_tail = _halfnorm_logpdf(jnp.maximum(y - borders[-2], 0.0), widths[-1])
    cond = jnp.where(k == 0, lo_tail, jnp.where(k == num_bars - 1, hi_tail, interior))
    return log_pk + cond


def nll(borders: jnp.ndarray, logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Negative log likelihood — the pretraining loss and the reference's
    ``criterion(logits, y)`` contract (npe_pfn.py:149-151)."""
    return -log_prob(borders, logits, y)


def sample(
    rng: jax.Array, borders: jnp.ndarray, logits: jnp.ndarray
) -> jnp.ndarray:
    """Draw one sample per logit row; reference contract
    ``criterion.sample(logits)`` (npe_pfn.py:146, 220).

    logits: [..., B] -> returns [...].
    """
    num_bars = logits.shape[-1]
    widths = _widths(borders)
    k_rng, u_rng, t_rng = jax.random.split(rng, 3)
    k = jax.random.categorical(k_rng, logits, axis=-1)
    u = jax.random.uniform(u_rng, shape=k.shape)
    interior = borders[k] + u * widths[k]
    tail = jnp.abs(jax.random.normal(t_rng, shape=k.shape))
    lo = borders[1] - tail * widths[0]
    hi = borders[-2] + tail * widths[-1]
    return jnp.where(k == 0, lo, jnp.where(k == num_bars - 1, hi, interior))


def mean(borders: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """E[y] under the bar distribution; used for classifier-style point
    predictions (posterior mean of a {0,1} target estimates P(y=1|x))."""
    widths = _widths(borders)
    mids = (borders[:-1] + borders[1:]) / 2.0
    mids = mids.at[0].set(borders[1] - widths[0] * _SQRT_2_OVER_PI)
    mids = mids.at[-1].set(borders[-2] + widths[-1] * _SQRT_2_OVER_PI)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(probs * mids, axis=-1)


def cdf(borders: jnp.ndarray, logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """P(Y <= y). Interior buckets are uniform; tails are half-normal."""
    num_bars = borders.shape[0] - 1
    widths = _widths(borders)
    batch = jnp.broadcast_shapes(logits.shape[:-1], jnp.shape(y))
    y = jnp.broadcast_to(y, batch)
    probs = jnp.broadcast_to(jax.nn.softmax(logits, axis=-1), batch + (num_bars,))
    cum = jnp.cumsum(probs, axis=-1)  # [..., B] inclusive cumulative mass

    k = jnp.clip(jnp.searchsorted(borders[1:-1], y, side="right"), 0, num_bars - 1)
    below = jnp.where(k > 0, jnp.take_along_axis(cum, jnp.maximum(k - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
    pk = jnp.take_along_axis(probs, k[..., None], axis=-1)[..., 0]

    frac_interior = jnp.clip((y - borders[k]) / widths[k], 0.0, 1.0)
    # Lower tail: mass below y is P(halfnorm > b1 - y) = 2*(1 - Phi((b1-y)/s)).
    z_lo = jnp.maximum(borders[1] - y, 0.0) / widths[0]
    frac_lo = 2.0 * (1.0 - jax.scipy.stats.norm.cdf(z_lo))
    z_hi = jnp.maximum(y - borders[-2], 0.0) / widths[-1]
    frac_hi = 2.0 * jax.scipy.stats.norm.cdf(z_hi) - 1.0
    frac = jnp.where(k == 0, frac_lo, jnp.where(k == num_bars - 1, frac_hi, frac_interior))
    return below + pk * frac


@partial(jax.jit, static_argnames=())
def icdf(borders: jnp.ndarray, logits: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Quantile function (used for TabPFN-style ``quantiles=[...]`` output)."""
    num_bars = borders.shape[0] - 1
    widths = _widths(borders)
    batch = jnp.broadcast_shapes(logits.shape[:-1], jnp.shape(q))
    q = jnp.broadcast_to(q, batch)
    probs = jnp.broadcast_to(jax.nn.softmax(logits, axis=-1), batch + (num_bars,))
    cum = jnp.cumsum(probs, axis=-1)
    # Batched searchsorted: count buckets whose cumulative mass is below q.
    k = jnp.clip(jnp.sum((cum < q[..., None]).astype(jnp.int32), axis=-1), 0, num_bars - 1)
    below = jnp.where(k > 0, jnp.take_along_axis(cum, jnp.maximum(k - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
    pk = jnp.take_along_axis(probs, k[..., None], axis=-1)[..., 0]
    frac = jnp.clip((q - below) / jnp.maximum(pk, 1e-12), 0.0, 1.0)
    interior = borders[k] + frac * widths[k]
    # Tail inversions.
    z_lo = jax.scipy.special.ndtri(jnp.clip(1.0 - frac / 2.0, 1e-7, 1 - 1e-7))
    lo = borders[1] - z_lo * widths[0]
    z_hi = jax.scipy.special.ndtri(jnp.clip((frac + 1.0) / 2.0, 1e-7, 1 - 1e-7))
    hi = borders[-2] + z_hi * widths[-1]
    return jnp.where(k == 0, lo, jnp.where(k == num_bars - 1, hi, interior))
