"""Unconditional density estimation p(θ) via cluster-conditioned TabICA.

Rebuild of the reference's TabPFN_Based_Uncond_Estimator (reference:
npe_pfn.py:747-900): k-means-cluster θ, use a dummy feature column so the
in-context regressor works unconditionally, sample clusters multinomially by
size, and mix per-cluster log-probs with multinomial weights. The reference's
sklearn KMeans (npe_pfn.py:793-794) becomes a jitted Lloyd iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .estimator import autoregressive_log_prob, autoregressive_sample, _round_up
from .models import checkpoint as ckpt_mod
from .models.regressor import TabICAModel


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(
    rng: jax.Array, points: jnp.ndarray, num_clusters: int, num_iters: int = 25
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's algorithm on device. Returns (centroids [K, d], labels [N])."""
    n = points.shape[0]
    init_idx = jax.random.permutation(rng, n)[:num_clusters]
    centroids = points[init_idx]

    def step(centroids, _):
        d2 = jnp.sum(
            jnp.square(points[:, None, :] - centroids[None, :, :]), axis=-1
        )
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=points.dtype)
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new_c = (onehot.T @ points) / counts[:, None]
        # Keep empty clusters where they were.
        new_c = jnp.where((onehot.sum(0) > 0)[:, None], new_c, centroids)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    d2 = jnp.sum(jnp.square(points[:, None, :] - centroids[None, :, :]), axis=-1)
    return centroids, jnp.argmin(d2, axis=-1)


class UnconditionalEstimator:
    """p(θ) estimator: KMeans clusters + dummy-x conditioning + multinomial
    mixture (npe_pfn.py:747-900)."""

    def __init__(
        self,
        num_clusters: int = 1,
        model: Optional[TabICAModel] = None,
        context_size: int = 512,
        qry_chunk: int = 1024,
        min_cluster_size: int = 2,
        seed: int = 0,
        target_transform: str = "zscore",
    ):
        self.model = model if model is not None else ckpt_mod.load_default()[0]
        self.num_clusters = num_clusters
        self.context_size = context_size
        self.qry_chunk = qry_chunk
        self.target_transform = target_transform
        self.min_cluster_size = min_cluster_size
        self._rng = jax.random.PRNGKey(seed)
        self._theta: Optional[jnp.ndarray] = None
        self._labels: Optional[np.ndarray] = None
        self._centroids: Optional[jnp.ndarray] = None
        self._weights: Optional[np.ndarray] = None

    def _next(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def set_cluster_state(self, centroids, labels):
        """npe_pfn.py:771 analog for precomputed clustering."""
        self._centroids = jnp.asarray(centroids)
        self._labels = np.asarray(labels)
        counts = np.bincount(self._labels, minlength=self.num_clusters)
        self._weights = counts / counts.sum()

    def append_simulations(self, theta) -> "UnconditionalEstimator":
        """Shuffle + cluster (npe_pfn.py:783-800). Asserts every cluster has
        at least min_cluster_size members like the reference (npe_pfn.py:797)."""
        theta = jnp.asarray(theta, jnp.float32)
        if theta.ndim == 1:
            theta = theta[:, None]
        perm = jax.random.permutation(self._next(), theta.shape[0])
        theta = theta[perm]
        self._theta = theta
        centroids, labels = kmeans(self._next(), theta, self.num_clusters)
        labels = np.asarray(labels)
        counts = np.bincount(labels, minlength=self.num_clusters)
        if counts.min() < self.min_cluster_size:
            raise ValueError(
                f"smallest cluster has {counts.min()} < {self.min_cluster_size} "
                "members; reduce num_clusters (reference npe_pfn.py:797)"
            )
        self.set_cluster_state(centroids, labels)
        return self

    def _cluster_context(self, c: int):
        """Dummy-feature context for cluster c (npe_pfn.py:774-781, 790)."""
        idx = np.nonzero(self._labels == c)[0][: self.context_size]
        theta_c = self._theta[idx]
        n = theta_c.shape[0]
        dummy = jax.random.normal(jax.random.PRNGKey(c), (self.context_size, 1))
        pad = self.context_size - n
        theta_pad = jnp.concatenate(
            [theta_c, jnp.zeros((pad, theta_c.shape[1]))], axis=0
        )
        mask = jnp.arange(self.context_size) < n
        return theta_pad, dummy, mask

    def sample(self, num_samples: int, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Multinomial cluster allocation then per-cluster sampling
        (npe_pfn.py:802-844). Queries use fresh dummy-x draws
        (repeat_x=False semantics)."""
        rng = rng if rng is not None else self._next()
        k_alloc, rng = jax.random.split(rng)
        counts = np.asarray(
            jax.random.multinomial(
                k_alloc, num_samples, jnp.asarray(self._weights, jnp.float32)
            )
        ).astype(int)
        outs = []
        for c in range(self.num_clusters):
            if counts[c] == 0:
                continue
            rng, k_draw, k_dummy = jax.random.split(rng, 3)
            theta_ctx, x_ctx, mask = self._cluster_context(c)
            q = _round_up(int(counts[c]), self.qry_chunk)
            x_qry = jax.random.normal(k_dummy, (q, 1))
            theta, _ = autoregressive_sample(
                self.model, theta_ctx, x_ctx, mask, x_qry, k_draw,
                self.qry_chunk, self.target_transform,
            )
            outs.append(np.asarray(theta[: counts[c]]))
        out = np.concatenate(outs, axis=0)
        perm = np.random.default_rng(0).permutation(out.shape[0])
        return jnp.asarray(out[perm])

    def log_prob(self, theta, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Route each θ to its nearest cluster, score under that cluster's
        conditional, add log multinomial weight (npe_pfn.py:846-900)."""
        theta = jnp.asarray(theta, jnp.float32)
        if theta.ndim == 1:
            theta = theta[:, None]
        rng = rng if rng is not None else self._next()
        d2 = jnp.sum(
            jnp.square(theta[:, None, :] - self._centroids[None, :, :]), axis=-1
        )
        route = np.asarray(jnp.argmin(d2, axis=-1))
        lp = np.zeros(theta.shape[0], np.float32)
        for c in range(self.num_clusters):
            idx = np.nonzero(route == c)[0]
            if idx.size == 0:
                continue
            rng, k_dummy = jax.random.split(rng)
            theta_ctx, x_ctx, mask = self._cluster_context(c)
            q = _round_up(idx.size, self.qry_chunk)
            pad = q - idx.size
            x_qry = jax.random.normal(k_dummy, (q, 1))
            theta_eval = jnp.concatenate(
                [theta[idx], jnp.zeros((pad, theta.shape[1]))], axis=0
            )
            lp_c = autoregressive_log_prob(
                self.model, theta_ctx, x_ctx, mask, x_qry, theta_eval,
                self.qry_chunk, self.target_transform,
            )
            lp[idx] = np.asarray(lp_c[: idx.size]) + np.log(self._weights[c])
        return jnp.asarray(lp)
