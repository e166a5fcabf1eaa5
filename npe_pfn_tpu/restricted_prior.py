"""Classifier-based restricted prior.

Rebuild of the reference's NPE_PFN_RestrictedPrior (reference:
restricted_prior.py:8-97): an alternative truncation where an in-context
classifier decides whether θ lies in the posterior support. θ is accepted
when P(valid) > threshold (restricted_prior.py:24-27); labeled θ accumulate
across rounds and the classifier context is refit with class-balanced
subsampling capped at a fixed budget (restricted_prior.py:41-97).

The classifier is TabICA's posterior-mean-of-{0,1} head — the same frozen
model, no gradient training.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import Distribution
from .models import checkpoint as ckpt_mod
from .models import regressor
from .models.regressor import TabICAModel


class RestrictedPrior(Distribution):
    def __init__(
        self,
        prior: Distribution,
        model: Optional[TabICAModel] = None,
        accept_threshold: float = 0.3,
        max_context: int = 512,
        max_iters: int = 32,
        batch_size: int = 16_384,
        seed: int = 0,
    ):
        self.prior = prior
        self.model = model if model is not None else ckpt_mod.load_default()[0]
        self.accept_threshold = accept_threshold
        self.max_context = max_context
        self.max_iters = max_iters
        self.batch_size = batch_size
        self._rng = jax.random.PRNGKey(seed)
        self._theta: Optional[jnp.ndarray] = None  # accumulated labeled θ
        self._labels: Optional[jnp.ndarray] = None
        self._ctx_theta: Optional[jnp.ndarray] = None  # balanced classifier ctx
        self._ctx_labels: Optional[jnp.ndarray] = None

    @property
    def event_dim(self) -> int:
        return self.prior.event_dim

    def _next(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def append_simulations(self, theta: jnp.ndarray, labels: jnp.ndarray) -> "RestrictedPrior":
        """Accumulate labeled θ (1 = in support) and refit the classifier
        context with class-balanced subsampling (restricted_prior.py:41-97)."""
        theta = jnp.asarray(theta, jnp.float32)
        labels = jnp.asarray(labels, jnp.float32).reshape(-1)
        if self._theta is None:
            self._theta, self._labels = theta, labels
        else:
            self._theta = jnp.concatenate([self._theta, theta], axis=0)
            self._labels = jnp.concatenate([self._labels, labels], axis=0)

        lab = np.asarray(self._labels)
        pos = np.nonzero(lab == 1)[0]
        neg = np.nonzero(lab == 0)[0]
        half = self.max_context // 2
        rng = np.random.default_rng(int(jax.random.randint(self._next(), (), 0, 2**31 - 1)))
        take_pos = rng.permutation(pos)[: min(half, pos.size)]
        # Balance: negatives capped to match positives (up to budget).
        n_neg = min(self.max_context - take_pos.size, neg.size)
        take_neg = rng.permutation(neg)[:n_neg]
        idx = np.concatenate([take_pos, take_neg])
        self._ctx_theta = self._theta[idx]
        self._ctx_labels = self._labels[idx]
        return self

    def accept_reject_fn(self, theta: jnp.ndarray) -> jnp.ndarray:
        """P(valid|θ) > threshold (restricted_prior.py:24-27). Before any
        labeled data exists, accept everything."""
        if self._ctx_theta is None:
            return jnp.ones(theta.shape[:-1], bool)
        probs = regressor.predict_proba(
            self.model, self._ctx_theta, self._ctx_labels, theta
        )
        return probs[..., 1] > self.accept_threshold

    def sample(self, rng: Optional[jax.Array] = None, shape=()):
        n = int(np.prod(shape)) if shape else 1
        rng = rng if rng is not None else self._next()
        out, got = [], 0
        for _ in range(self.max_iters):
            rng, k = jax.random.split(rng)
            cand = self.prior.sample(k, (self.batch_size,))
            keep = np.asarray(self.accept_reject_fn(cand))
            idx = np.nonzero(keep)[0][: n - got]
            if idx.size:
                out.append(np.asarray(cand)[idx])
                got += idx.size
            if got >= n:
                break
        if got < n:  # escape hatch: unrestricted prior samples
            rng, k = jax.random.split(rng)
            out.append(np.asarray(self.prior.sample(k, (n - got,))))
        flat = jnp.asarray(np.concatenate(out, axis=0)[:n])
        return flat.reshape(tuple(shape) + (self.event_dim,)) if shape else flat[0]

    def log_prob(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized, like the reference's normalize_log_prob=False for
        efficiency (restricted_prior.py:30-39): prior density where accepted,
        -inf where rejected."""
        acc = self.accept_reject_fn(theta)
        return jnp.where(acc, self.prior.log_prob(theta), -jnp.inf)

    def support_check(self, theta: jnp.ndarray) -> jnp.ndarray:
        return self.accept_reject_fn(theta) & self.prior.support_check(theta)
