"""Trained-NPE baseline: a conditional normalizing flow, pure JAX/optax.

The reference's headline narrative artifact (demo.ipynb cell 4) contrasts a
classical NPE — an sbi flow that needs ~214 training epochs — against
NPE-PFN's zero-training in-context inference. This module provides the
trained side of that comparison natively: a RealNVP-style conditional
coupling flow q(θ|x) with alternating binary masks, trained by maximum
likelihood on the same (θ, x) simulations the estimator receives as context.

Idiomatic-TPU notes: the whole training loop is one `lax.scan` over jitted
epoch steps (static shapes, no Python-side batch loop), and
sampling/log_prob are jitted pure functions — this is a baseline, but it
still follows the framework's compile-once discipline.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _mlp_init(rng, sizes):
    params = []
    for i in range(len(sizes) - 1):
        rng, k1, k2 = jax.random.split(rng, 3)
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1])) * jnp.sqrt(
            2.0 / sizes[i]
        )
        b = jnp.zeros(sizes[i + 1])
        params.append((w, b))
    # Zero-init the last layer: the flow starts at the identity map, which
    # stabilizes early training.
    w, b = params[-1]
    params[-1] = (jnp.zeros_like(w), b)
    return params


def _mlp_apply(params, h):
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i < len(params) - 1:
            h = jax.nn.gelu(h)
    return h


def _coupling_masks(dim: int, num_layers: int):
    """Alternating binary masks; every dim is transformed by half the layers."""
    base = (jnp.arange(dim) % 2).astype(jnp.float32)
    return jnp.stack([base if i % 2 == 0 else 1.0 - base for i in range(num_layers)])


@dataclass
class FlowNPE:
    """Conditional coupling flow q(θ|x) trained on simulations.

    API mirrors the estimator surface the demo needs: ``fit`` (returns the
    number of epochs actually trained — the headline number),
    ``sample(n, x_o, rng)``, ``log_prob(theta, x_o)``.
    """

    dim_theta: int
    dim_x: int
    num_layers: int = 6
    hidden: int = 64
    lr: float = 1e-3
    batch_size: int = 128
    max_epochs: int = 500
    patience: int = 20
    val_frac: float = 0.1
    seed: int = 0

    params: Optional[list] = field(default=None, repr=False)
    epochs_trained: int = 0
    _stats: Optional[tuple] = field(default=None, repr=False)

    def _init_params(self, rng):
        masks = _coupling_masks(self.dim_theta, self.num_layers)
        params = []
        for i in range(self.num_layers):
            rng, k = jax.random.split(rng)
            # conditioner: (θ·mask, x) -> (shift, log_scale) for 1-mask dims
            params.append(
                _mlp_init(
                    k,
                    [self.dim_theta + self.dim_x, self.hidden, self.hidden,
                     2 * self.dim_theta],
                )
            )
        return params, masks

    def _forward(self, params, masks, theta, x):
        """θ -> z with log|det dz/dθ| (for log_prob)."""
        z = theta
        ldj = jnp.zeros(theta.shape[:-1])
        for layer, mask in zip(params, masks):
            h = _mlp_apply(layer, jnp.concatenate([z * mask, x], axis=-1))
            shift, log_s = jnp.split(h, 2, axis=-1)
            log_s = 2.0 * jnp.tanh(log_s / 2.0)  # bounded scales
            z = mask * z + (1.0 - mask) * (z * jnp.exp(log_s) + shift)
            ldj = ldj + jnp.sum((1.0 - mask) * log_s, axis=-1)
        return z, ldj

    def _inverse(self, params, masks, z, x):
        theta = z
        for layer, mask in zip(reversed(params), reversed(list(masks))):
            h = _mlp_apply(layer, jnp.concatenate([theta * mask, x], axis=-1))
            shift, log_s = jnp.split(h, 2, axis=-1)
            log_s = 2.0 * jnp.tanh(log_s / 2.0)
            theta = mask * theta + (1.0 - mask) * (theta - shift) * jnp.exp(-log_s)
        return theta

    def _nll(self, params, masks, theta, x):
        z, ldj = self._forward(params, masks, theta, x)
        log_base = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * self.dim_theta * math.log(
            2 * math.pi
        )
        return -(log_base + ldj)

    def fit(self, theta, x, rng: Optional[jax.Array] = None, verbose: bool = False):
        """Max-likelihood training with early stopping on a validation split.
        Returns the number of epochs trained (the demo's headline number)."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        theta = jnp.asarray(theta, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        t_mu, t_sd = theta.mean(0), theta.std(0) + 1e-6
        x_mu, x_sd = x.mean(0), x.std(0) + 1e-6
        self._stats = (t_mu, t_sd, x_mu, x_sd)
        th = (theta - t_mu) / t_sd
        xs = (x - x_mu) / x_sd

        n = th.shape[0]
        n_val = max(1, int(n * self.val_frac))
        rng, k_perm, k_init = jax.random.split(rng, 3)
        perm = jax.random.permutation(k_perm, n)
        th, xs = th[perm], xs[perm]
        th_tr, xs_tr = th[n_val:], xs[n_val:]
        th_va, xs_va = th[:n_val], xs[:n_val]

        params, masks = self._init_params(k_init)
        opt = optax.adam(self.lr)
        opt_state = opt.init(params)

        bs = min(self.batch_size, th_tr.shape[0])
        steps_per_epoch = max(1, th_tr.shape[0] // bs)

        def loss_fn(p, tb, xb):
            return jnp.mean(self._nll(p, masks, tb, xb))

        @jax.jit
        def epoch_step(carry, k):
            p, s = carry
            idx = jax.random.permutation(k, th_tr.shape[0])[: steps_per_epoch * bs]
            tb = th_tr[idx].reshape(steps_per_epoch, bs, -1)
            xb = xs_tr[idx].reshape(steps_per_epoch, bs, -1)

            def step(c, batch):
                p, s = c
                loss, g = jax.value_and_grad(loss_fn)(p, *batch)
                upd, s = opt.update(g, s, p)
                return (optax.apply_updates(p, upd), s), loss

            (p, s), losses = jax.lax.scan(step, (p, s), (tb, xb))
            val = jnp.mean(self._nll(p, masks, th_va, xs_va))
            return (p, s), (jnp.mean(losses), val)

        best_val, best_params, bad = jnp.inf, params, 0
        for epoch in range(self.max_epochs):
            rng, k = jax.random.split(rng)
            (params, opt_state), (tr_loss, val_loss) = epoch_step(
                (params, opt_state), k
            )
            self.epochs_trained = epoch + 1
            if float(val_loss) < float(best_val) - 1e-4:
                best_val, best_params, bad = val_loss, params, 0
            else:
                bad += 1
                if bad >= self.patience:
                    break
            if verbose and (epoch + 1) % 25 == 0:
                print(
                    f"[flow-npe] epoch {epoch + 1} train {float(tr_loss):.4f} "
                    f"val {float(val_loss):.4f}"
                )
        self.params = best_params
        self._masks = _coupling_masks(self.dim_theta, self.num_layers)
        return self.epochs_trained

    def sample(self, num_samples: int, x_o, rng: Optional[jax.Array] = None):
        assert self.params is not None, "call fit() first"
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        t_mu, t_sd, x_mu, x_sd = self._stats
        xn = (jnp.asarray(x_o, jnp.float32).reshape(-1) - x_mu) / x_sd
        z = jax.random.normal(rng, (num_samples, self.dim_theta))
        xb = jnp.broadcast_to(xn, (num_samples, self.dim_x))
        th = self._inverse(self.params, self._masks, z, xb)
        return th * t_sd + t_mu

    def log_prob(self, theta, x_o):
        assert self.params is not None, "call fit() first"
        t_mu, t_sd, x_mu, x_sd = self._stats
        theta = jnp.asarray(theta, jnp.float32)
        xn = (jnp.asarray(x_o, jnp.float32).reshape(-1) - x_mu) / x_sd
        th = (theta - t_mu) / t_sd
        xb = jnp.broadcast_to(xn, (theta.shape[0], self.dim_x))
        nll = self._nll(self.params, self._masks, th, xb)
        return -nll - jnp.sum(jnp.log(t_sd))
