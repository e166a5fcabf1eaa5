"""Target-side preprocessing transforms (TabPFN-style ensemble variants).

TabPFNv2's accuracy partly comes from an ensemble over preprocessing
variants, the most important being a quantile transform of the regression
target (SURVEY.md §2.4 "preprocessing/ensembling pipeline"; the reference
inherits it from the external ``tabpfn`` package's inference config). For
NPE-PFN the target is one θ-dimension at a time, and the transform matters
doubly: the bar-distribution head discretizes the *normalized* target space
uniformly, so a thin posterior mode (two-moons' crescent, width ~0.01 prior
units) lands in a fraction of one bar under plain z-scoring. Mapping the
context targets to normal scores first spreads the context's θ-marginal over
the full bar range — *adaptive* bin resolution: dense θ-regions get wide
z-slices and therefore many bars.

TPU-native design: the transform is a strictly-monotone piecewise-linear
bijection θ ↔ z with STATIC shapes (a fixed number of knots gathered at
evenly spaced quantile levels of the masked context), so it composes with
jit/vmap/scan and adds only an ``interp`` + ``searchsorted`` per query —
negligible next to the transformer forward. Tails extrapolate linearly at
the z-score slope 1/sd so the bijection has full support (sampling can
leave the context's θ-range, and log-densities stay finite, matching the
full-support bar head's contract).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

_MIN_STD = 1e-6


@flax.struct.dataclass
class QuantileTransform:
    """Piecewise-linear monotone map θ → z ≈ Φ⁻¹(F̂(θ)).

    knots:   [K] strictly increasing θ-values at quantile levels (k+½)/K of
             the masked context.
    zknots:  [K] the fixed normal scores Φ⁻¹((k+½)/K).
    slope_lo/slope_hi: dz/dθ used beyond the outermost knots (= 1/sd of the
             masked context, the z-score slope).
    """

    knots: jnp.ndarray
    zknots: jnp.ndarray
    slope_lo: jnp.ndarray
    slope_hi: jnp.ndarray


def quantile_fit(
    y: jnp.ndarray,  # [N] context targets
    mask: jnp.ndarray,  # [N] valid-row mask
    num_knots: int = 64,
) -> QuantileTransform:
    """Fit the transform from masked context targets. Static shapes: works
    for any effective count n ≤ N (degenerate n ≤ 1 degrades to an affine
    map via the strictly-increasing repair + z-score tails)."""
    n_total = y.shape[-1]
    num_knots = min(num_knots, n_total)
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(y * w) / n
    sd = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(y - mu) * w) / n), _MIN_STD)

    big = jnp.asarray(3.4e38, y.dtype)
    ys = jnp.sort(jnp.where(mask, y, big))
    k = jnp.arange(num_knots)
    idx = jnp.clip(
        jnp.floor((k + 0.5) / num_knots * n).astype(jnp.int32),
        0,
        jnp.maximum(n - 1, 0).astype(jnp.int32),
    )
    knots = jnp.take(ys, idx)
    # Repair ties / tiny spacing so the map is strictly monotone: cumulative
    # max plus a data-scaled ramp keeps slopes finite without visibly moving
    # the knots.
    knots = jax.lax.cummax(knots) + (1e-5 * sd) * k
    zknots = ndtri((k + 0.5) / num_knots).astype(y.dtype)
    inv_sd = 1.0 / sd
    return QuantileTransform(
        knots=knots, zknots=zknots, slope_lo=inv_sd, slope_hi=inv_sd
    )


def quantile_forward(qt: QuantileTransform, y: jnp.ndarray) -> jnp.ndarray:
    """θ → z. Any query shape."""
    core = jnp.interp(y, qt.knots, qt.zknots)
    lo = qt.zknots[0] + (y - qt.knots[0]) * qt.slope_lo
    hi = qt.zknots[-1] + (y - qt.knots[-1]) * qt.slope_hi
    return jnp.where(
        y < qt.knots[0], lo, jnp.where(y > qt.knots[-1], hi, core)
    )


def quantile_inverse(qt: QuantileTransform, z: jnp.ndarray) -> jnp.ndarray:
    """z → θ (exact inverse of quantile_forward)."""
    core = jnp.interp(z, qt.zknots, qt.knots)
    lo = qt.knots[0] + (z - qt.zknots[0]) / qt.slope_lo
    hi = qt.knots[-1] + (z - qt.zknots[-1]) / qt.slope_hi
    return jnp.where(
        z < qt.zknots[0], lo, jnp.where(z > qt.zknots[-1], hi, core)
    )


def parse_transform(spec: str):
    """Split a transform spec into (target_transform, feature_quantile).

    The feature-side quantile transform (TabPFN's preprocessing ensemble
    also transforms the INPUT features per member, SURVEY §2.4; the
    target-only transform covers just the θ-dimension being sampled) rides
    the same static string the kernels already thread — ``"zscore+featq"``
    / ``"quantile+featq"`` — so the ~20 call sites and fused-sampler cache
    keys need no signature change. Features are conditioning variables, so
    no Jacobian is owed; queries go through the SAME context-fitted map.
    """
    if spec.endswith("+featq"):
        return spec[: -len("+featq")], True
    return spec, False


def quantile_fit_cols(x: jnp.ndarray, mask: jnp.ndarray) -> QuantileTransform:
    """Per-column fit: x [N, F], mask [N] → batched transform (leading F)."""
    return jax.vmap(quantile_fit, in_axes=(1, None))(x, mask)


def quantile_forward_cols(qts: QuantileTransform, x: jnp.ndarray) -> jnp.ndarray:
    """Apply per-column maps: x [..., F] with qts batched over F."""
    return jax.vmap(quantile_forward, in_axes=(0, -1), out_axes=-1)(qts, x)


def quantile_log_det(qt: QuantileTransform, y: jnp.ndarray) -> jnp.ndarray:
    """log |dz/dθ| at θ=y — the change-of-variables term:
    log p_θ(θ) = log p_z(z(θ)) + quantile_log_det(qt, θ)."""
    k = qt.knots.shape[0]
    i = jnp.clip(jnp.searchsorted(qt.knots, y, side="right"), 1, k - 1)
    seg = (qt.zknots[i] - qt.zknots[i - 1]) / (qt.knots[i] - qt.knots[i - 1])
    slope = jnp.where(
        y < qt.knots[0],
        qt.slope_lo,
        jnp.where(y > qt.knots[-1], qt.slope_hi, seg),
    )
    return jnp.log(slope)
