"""Embedding nets for high-dimensional observations.

The reference handles image-scale observations with a seeded random
projection 12288 → 128 before TabPFN ever sees them (reference:
evaluate_ropefm_batched.py:61-111 RandomProjection for the light_tunnel
task), and passes an optional ``embedding_net`` through the estimator
(npe_pfn.py:77-79, 272-274). Here embedding nets are plain jittable
callables; the estimator applies them to x in append_simulations and at
observation time (estimator._prep_obs).

TabICA adds a second reason to embed: its feature budget (cfg.max_features)
caps dx + dθ, so any x wider than the budget should be projected down.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class RandomProjectionEmbedding:
    """Seeded Gaussian random projection x ∈ R^din → R^dout (JL-style),
    variance-preserving (scaled by 1/sqrt(dout)); deterministic given seed."""

    def __init__(self, din: int, dout: int, seed: int = 0, standardize: bool = True):
        self.din, self.dout = din, dout
        self.standardize = standardize
        self.w = jax.random.normal(jax.random.PRNGKey(seed), (din, dout)) / jnp.sqrt(
            dout
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = jnp.asarray(x, jnp.float32) @ self.w
        if self.standardize:
            mu = jnp.mean(out, axis=-1, keepdims=True)
            sd = jnp.maximum(jnp.std(out, axis=-1, keepdims=True), 1e-9)
            out = (out - mu) / sd
        return out


class MLPEmbedding:
    """Small random-weight (or user-weighted) MLP embedding; useful as a
    fixed nonlinear feature map when a random projection loses structure."""

    def __init__(self, din: int, dout: int, hidden: int = 256, seed: int = 0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.w1 = jax.random.normal(k1, (din, hidden)) * (2.0 / din) ** 0.5
        self.w2 = jax.random.normal(k2, (hidden, dout)) * (1.0 / hidden) ** 0.5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.relu(jnp.asarray(x, jnp.float32) @ self.w1)
        return h @ self.w2


class Conv1DEmbedding:
    """Fixed random conv feature extractor for sequence-shaped observations
    (the reference trains ConvNN1D classifiers for its image task,
    evaluate_ropefm_batched.py:118-154; here convs serve as an embedding in
    front of the tabular model). Random filters + average pooling + linear
    readout; jit/vmap-safe, deterministic given seed."""

    def __init__(
        self,
        length: int,
        dout: int,
        channels: int = 16,
        kernel: int = 9,
        pool: int = 4,
        seed: int = 0,
    ):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.kernel = jax.random.normal(k1, (channels, 1, kernel)) / jnp.sqrt(kernel)
        pooled = ((length - kernel + 1) // pool) * channels
        self.w_out = jax.random.normal(k2, (pooled, dout)) / jnp.sqrt(pooled)
        self.pool = pool
        self.length = length

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        batch = x.shape[:-1]
        h = x.reshape((-1, 1, self.length))
        h = jax.lax.conv_general_dilated(
            h, self.kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        h = jax.nn.relu(h)
        # Average pool along the spatial axis.
        c, l = h.shape[1], h.shape[2]
        l_p = (l // self.pool) * self.pool
        h = h[:, :, :l_p].reshape(-1, c, l_p // self.pool, self.pool).mean(-1)
        h = h.reshape(h.shape[0], -1)
        out = h @ self.w_out
        return out.reshape(batch + (out.shape[-1],))


def chain(*nets: Callable) -> Callable:
    """Compose embedding nets left-to-right."""

    def apply(x):
        for net in nets:
            x = net(x)
        return x

    return apply
