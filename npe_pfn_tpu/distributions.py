"""Distribution protocol + implementations (JAX-native).

The reference leans on ``torch.distributions`` through a narrow surface:
``.sample(shape)``, ``.log_prob(x)``, ``.support.check(x)`` (reference:
npe_pfn.py:36, 594-600) plus BoxUniform bound introspection for pre-rejection
(support_posterior.py:312-323) and Logistic/MVN priors in the eval harness
(evaluate_ropefm.py:387-463). This module provides that surface as immutable
pytree dataclasses whose methods are jit/vmap-safe pure functions taking
explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


class Distribution:
    """Protocol: event-dim-1 distributions over R^d.

    sample(rng, shape) -> [*shape, d]; log_prob(x[..., d]) -> [...];
    support_check(x[..., d]) -> bool[...]; bounds() -> (low, high) or None.
    """

    @property
    def event_dim(self) -> int:
        raise NotImplementedError

    def sample(self, rng: jax.Array, shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        raise NotImplementedError

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def support_check(self, x: jnp.ndarray) -> jnp.ndarray:
        """Default: finite log-prob (matches the reference's fallback,
        npe_pfn.py:594-600)."""
        return jnp.isfinite(self.log_prob(x))

    def bounds(self) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
        """(low, high) if the support is a box, else None (used by the
        pre-rejection fast path, support_posterior.py:264-309)."""
        return None


@flax.struct.dataclass
class BoxUniform(Distribution):
    """Uniform over an axis-aligned box (sbi.utils.BoxUniform analog)."""

    low: jnp.ndarray
    high: jnp.ndarray

    @property
    def event_dim(self) -> int:
        return self.low.shape[-1]

    def sample(self, rng, shape=()):
        u = jax.random.uniform(rng, tuple(shape) + self.low.shape)
        return self.low + u * (self.high - self.low)

    def log_prob(self, x):
        inside = self.support_check(x)
        logp = -jnp.sum(jnp.log(self.high - self.low))
        return jnp.where(inside, logp, -jnp.inf)

    def support_check(self, x):
        return jnp.all((x >= self.low) & (x <= self.high), axis=-1)

    def bounds(self):
        return self.low, self.high


@flax.struct.dataclass
class Normal(Distribution):
    """Independent (diagonal) normal over R^d."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def event_dim(self) -> int:
        return self.loc.shape[-1]

    def sample(self, rng, shape=()):
        eps = jax.random.normal(rng, tuple(shape) + self.loc.shape)
        return self.loc + eps * self.scale

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return jnp.sum(
            -0.5 * z**2 - jnp.log(self.scale) - 0.5 * math.log(2 * math.pi), axis=-1
        )

    def support_check(self, x):
        return jnp.all(jnp.isfinite(x), axis=-1)


@flax.struct.dataclass
class MultivariateNormal(Distribution):
    loc: jnp.ndarray  # [d]
    cov: jnp.ndarray  # [d, d]

    @property
    def event_dim(self) -> int:
        return self.loc.shape[-1]

    def _chol(self):
        return jnp.linalg.cholesky(self.cov)

    def sample(self, rng, shape=()):
        eps = jax.random.normal(rng, tuple(shape) + self.loc.shape)
        return self.loc + eps @ self._chol().T

    def log_prob(self, x):
        d = self.event_dim
        chol = self._chol()
        diff = x - self.loc
        flat = diff.reshape(-1, d)
        sol = jax.scipy.linalg.solve_triangular(chol, flat.T, lower=True)
        maha = jnp.sum(sol**2, axis=0).reshape(diff.shape[:-1])
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (maha + logdet + d * math.log(2 * math.pi))

    def support_check(self, x):
        return jnp.all(jnp.isfinite(x), axis=-1)


@flax.struct.dataclass
class Logistic(Distribution):
    """Independent logistic (used by the eval harness's logit-space priors,
    reference evaluate_ropefm.py:433)."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def event_dim(self) -> int:
        return self.loc.shape[-1]

    def sample(self, rng, shape=()):
        u = jax.random.uniform(
            rng, tuple(shape) + self.loc.shape, minval=1e-7, maxval=1 - 1e-7
        )
        return self.loc + self.scale * (jnp.log(u) - jnp.log1p(-u))

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return jnp.sum(-z - 2 * jax.nn.softplus(-z) - jnp.log(self.scale), axis=-1)

    def support_check(self, x):
        return jnp.all(jnp.isfinite(x), axis=-1)


@flax.struct.dataclass
class TruncatedByBounds(Distribution):
    """`base` truncated to an axis-aligned box (unnormalized log_prob, like
    the reference's truncated-prior-over-posterior SIR weights,
    support_posterior.py:219-231)."""

    base: Distribution
    low: jnp.ndarray
    high: jnp.ndarray

    @property
    def event_dim(self) -> int:
        return self.base.event_dim

    def sample(self, rng, shape=()):
        """Fixed-shape rejection against `base`: every iteration redraws the
        still-rejected slots (compile-once under jit); after 32 rounds the
        stragglers are clamped to the box — the same bounded escape-hatch
        convention as the rest of the framework (accept_reject_sampler.py:74-77
        semantics)."""
        shape = tuple(shape)

        def body(_, carry):
            cur, ok, k = carry
            k, kd = jax.random.split(k)
            cand = self.base.sample(kd, shape)
            inside = jnp.all((cand >= self.low) & (cand <= self.high), axis=-1)
            cur = jnp.where((~ok & inside)[..., None], cand, cur)
            return cur, ok | inside, k

        rng, kd = jax.random.split(rng)
        cand0 = self.base.sample(kd, shape)
        ok0 = jnp.all((cand0 >= self.low) & (cand0 <= self.high), axis=-1)
        cur, ok, _ = jax.lax.fori_loop(0, 31, body, (cand0, ok0, rng))
        return jnp.where(ok[..., None], cur, jnp.clip(cur, self.low, self.high))

    def log_prob(self, x):
        inside = jnp.all((x >= self.low) & (x <= self.high), axis=-1)
        return jnp.where(inside, self.base.log_prob(x), -jnp.inf)

    def support_check(self, x):
        return jnp.all((x >= self.low) & (x <= self.high), axis=-1) & self.base.support_check(x)

    def bounds(self):
        return self.low, self.high


@flax.struct.dataclass
class LogitBoxBijection:
    """θ ↔ logit((θ − low)/(high − low)) — the reference's LogitBoxTransform
    (evaluate_ropefm.py:405-433): box-constrained parameters are estimated in
    unbounded logit space, where the pushforward of BoxUniform(low, high) is
    exactly Logistic(0, 1) per dimension. Use with `Logistic` as the
    transformed-space prior."""

    low: jnp.ndarray
    high: jnp.ndarray

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        u = jnp.clip((x - self.low) / (self.high - self.low), 1e-7, 1 - 1e-7)
        return jnp.log(u) - jnp.log1p(-u)

    def inverse(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.low + (self.high - self.low) * jax.nn.sigmoid(z)

    def forward_log_det(self, x: jnp.ndarray) -> jnp.ndarray:
        """Σ log |dz/dθ|: log p_z(z) = log p_θ(θ) − forward_log_det(θ)."""
        u = jnp.clip((x - self.low) / (self.high - self.low), 1e-7, 1 - 1e-7)
        return jnp.sum(
            -jnp.log(u) - jnp.log1p(-u) - jnp.log(self.high - self.low), axis=-1
        )


def intersect_boxes(a: BoxUniform, low, high) -> BoxUniform:
    """Box-uniform intersected with bounds — the uniform shortcut of the
    reference's pre-rejection (support_posterior.py:295-307)."""
    return BoxUniform(low=jnp.maximum(a.low, low), high=jnp.minimum(a.high, high))
