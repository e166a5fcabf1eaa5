"""Sample-quality metrics: C2ST, MMD, Wasserstein — TPU-native.

Rebuilds of the reference's eval metrics (reference: evaluate_ropefm.py
C2ST :119-280, MMD :283-320, Wasserstein via the external POT package
:626-629). Differences by design:

- C2ST: the reference trains a 5-fold torch MLP per evaluation. Here the
  classifier is a small jitted MLP trained full-batch with optax inside one
  XLA program per fold — folds vmapped, so the whole metric is a single
  device computation.
- Wasserstein: POT's exact solver is replaced by (a) entropic Sinkhorn on
  device (default) and (b) an exact Hungarian assignment via scipy for
  small n (validation of the Sinkhorn approximation).
- MMD: multiscale and rbf kernels, matching the reference's two variants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _standardize(a: jnp.ndarray, b: jnp.ndarray):
    both = jnp.concatenate([a, b], axis=0)
    mu = jnp.mean(both, axis=0)
    sd = jnp.maximum(jnp.std(both, axis=0), 1e-9)
    return (a - mu) / sd, (b - mu) / sd


# ---------------------------------------------------------------------------
# C2ST
# ---------------------------------------------------------------------------


def _mlp_init(rng, din, hidden):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "w1": jax.random.normal(k1, (din, hidden)) * (2.0 / din) ** 0.5,
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, hidden)) * (2.0 / hidden) ** 0.5,
        "b2": jnp.zeros(hidden),
        "w3": jax.random.normal(k3, (hidden, 1)) * (2.0 / hidden) ** 0.5,
        "b3": jnp.zeros(1),
    }


def _mlp_logit(p, x):
    h = jax.nn.relu(x @ p["w1"] + p["b1"])
    h = jax.nn.relu(h @ p["w2"] + p["b2"])
    return (h @ p["w3"] + p["b3"])[..., 0]


def c2st_embedded(rng, a, b, embed_fn, **kwargs):
    """C2ST through a fixed feature embedding — the reference trains CNN
    classifiers for image-shaped samples (evaluate_ropefm_batched.py:118-248);
    here a fixed conv/projection embedding (npe_pfn_tpu.embeddings) feeds the
    same jitted MLP C2ST."""
    return c2st(rng, jnp.asarray(embed_fn(a)), jnp.asarray(embed_fn(b)), **kwargs)


@partial(jax.jit, static_argnames=("folds", "epochs", "hidden", "paired"))
def c2st(
    rng: jax.Array,
    a: jnp.ndarray,
    b: jnp.ndarray,
    folds: int = 5,
    epochs: int = 300,
    hidden: int = 64,
    lr: float = 1e-2,
    paired: bool = False,
) -> jnp.ndarray:
    """Classifier two-sample test accuracy in [0.5, 1]; 0.5 = indistinguishable.

    Matches the reference's protocol shape (5-fold CV MLP classifier,
    evaluate_ropefm.py:119-280) with the folds vmapped on device.
    a, b: [n, d] equal-size sample sets.

    ``paired=True``: rows a[i] and b[i] share identifying features (the
    joint diagnostic {(θ̂, x_i)} vs {(θ*, x_i)} duplicates every x_i with
    opposite labels). Plain row-level folds then reward memorizing x_i's
    train-fold label, which is systematically WRONG for the partner copy in
    the test fold — held-out accuracy collapses below chance (seen at 0.27
    on near-perfect posteriors). Group folds put both copies of a pair in
    the same fold, restoring accuracy ≈ 0.5 for indistinguishable θ.
    """
    n = min(a.shape[0], b.shape[0])
    n = (n // folds) * folds
    a, b = _standardize(a[:n], b[:n])
    perm_rng, rng = jax.random.split(rng)  # independent of the fold keys
    if paired:
        perm = jax.random.permutation(perm_rng, n)
        x = jnp.concatenate([a[perm], b[perm]], axis=0)
        y = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
        pos = jnp.concatenate([jnp.arange(n), jnp.arange(n)])  # pair id
        fold_size = n // folds
    else:
        x = jnp.concatenate([a, b], axis=0)
        y = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
        perm = jax.random.permutation(perm_rng, 2 * n)
        x, y = x[perm], y[perm]
        pos = jnp.arange(2 * n)
        fold_size = (2 * n) // folds

    def run_fold(fold, key):
        test_mask = (pos >= fold * fold_size) & (pos < (fold + 1) * fold_size)
        train_w = (~test_mask).astype(jnp.float32)
        params = _mlp_init(key, x.shape[1], hidden)

        def loss_fn(p):
            logits = _mlp_logit(p, x)
            ls = optax_sigmoid_ce(logits, y)
            return jnp.sum(ls * train_w) / jnp.sum(train_w)

        import optax

        opt = optax.adam(lr)
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), None

        (params, _), _ = jax.lax.scan(step, (params, state), None, length=epochs)
        pred = (_mlp_logit(params, x) > 0).astype(jnp.float32)
        correct = (pred == y).astype(jnp.float32)
        return jnp.sum(correct * test_mask) / jnp.sum(test_mask)

    keys = jax.random.split(rng, folds)
    accs = jax.vmap(run_fold)(jnp.arange(folds), keys)
    return jnp.mean(accs)


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


# ---------------------------------------------------------------------------
# Trained convolutional C2ST discriminators
#
# The reference trains CNN classifiers for its image-shaped samples
# (evaluate_ropefm_batched.py:118-304: ConvNN1D, ConvNN1DLight_v2, ConvNN2DLT,
# and an embedding-aware DefaultMLP over [θ, embed(x)]). Here one generalized
# trained discriminator covers all of them: a strided conv trunk (1D or 2D by
# the rank of `shape`) over the image part, global mean+max pooled, optionally
# concatenated with plain leading dims (θ for joint tests), then the same MLP
# head — trained full-batch with Adam inside lax.scan, folds vmapped, the
# whole metric one XLA program (vs the reference's per-fold torch loops).
# ---------------------------------------------------------------------------


def _conv_trunk_init(rng, shape, channels):
    nd = len(shape)
    k1, k2 = jax.random.split(rng)
    if nd == 1:
        w1 = jax.random.normal(k1, (channels, 1, 5)) / jnp.sqrt(5.0)
        w2 = jax.random.normal(k2, (2 * channels, channels, 5)) / jnp.sqrt(5.0 * channels)
    else:
        w1 = jax.random.normal(k1, (channels, 1, 3, 3)) / 3.0
        w2 = jax.random.normal(k2, (2 * channels, channels, 3, 3)) / (3.0 * jnp.sqrt(channels))
    return {"w1": w1, "b1": jnp.zeros(channels), "w2": w2, "b2": jnp.zeros(2 * channels)}


def _conv_trunk_apply(p, x, shape):
    """x: [n, prod(shape)] → pooled features [n, 4*channels]."""
    nd = len(shape)
    n = x.shape[0]
    h = x.reshape((n, 1) + tuple(shape))
    if nd == 1:
        dn, strides = ("NCH", "OIH", "NCH"), (2,)
    else:
        dn, strides = ("NCHW", "OIHW", "NCHW"), (2, 2)
    h = jax.lax.conv_general_dilated(h, p["w1"], strides, "SAME", dimension_numbers=dn)
    h = jax.nn.relu(h + p["b1"].reshape((1, -1) + (1,) * nd))
    h = jax.lax.conv_general_dilated(h, p["w2"], strides, "SAME", dimension_numbers=dn)
    h = jax.nn.relu(h + p["b2"].reshape((1, -1) + (1,) * nd))
    spatial = tuple(range(2, 2 + nd))
    return jnp.concatenate([jnp.mean(h, spatial), jnp.max(h, spatial)], axis=-1)


@partial(jax.jit, static_argnames=("shape", "d_extra", "folds", "epochs", "channels", "hidden", "paired"))
def c2st_conv(
    rng: jax.Array,
    a: jnp.ndarray,
    b: jnp.ndarray,
    shape: tuple,
    d_extra: int = 0,
    folds: int = 5,
    epochs: int = 200,
    channels: int = 8,
    hidden: int = 64,
    lr: float = 2e-3,
    paired: bool = False,
) -> jnp.ndarray:
    """C2ST with a TRAINED conv discriminator for image-shaped samples.

    a, b: [n, d_extra + prod(shape)] — the first d_extra columns are plain
    dims (θ in joint tests), the rest a flattened image of `shape`
    ((L,) → 1D convs, (H, W) → 2D convs). Returns accuracy in [0.5, 1].
    ``paired`` groups a[i]/b[i] into the same fold (see c2st — required for
    the joint diagnostic where both rows share the same x).
    """
    import optax

    n = min(a.shape[0], b.shape[0])
    n = (n // folds) * folds
    a, b = _standardize(a[:n], b[:n])
    perm_rng, rng = jax.random.split(rng)
    if paired:
        perm = jax.random.permutation(perm_rng, n)
        x = jnp.concatenate([a[perm], b[perm]], axis=0)
        y = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
        pos = jnp.concatenate([jnp.arange(n), jnp.arange(n)])
        fold_size = n // folds
    else:
        x = jnp.concatenate([a, b], axis=0)
        y = jnp.concatenate([jnp.zeros(n), jnp.ones(n)])
        perm = jax.random.permutation(perm_rng, 2 * n)
        x, y = x[perm], y[perm]
        pos = jnp.arange(2 * n)
        fold_size = (2 * n) // folds
    x_extra, x_img = x[:, :d_extra], x[:, d_extra:]

    def run_fold(fold, key):
        test_mask = (pos >= fold * fold_size) & (pos < (fold + 1) * fold_size)
        train_w = (~test_mask).astype(jnp.float32)
        k1, k2 = jax.random.split(key)
        feat_dim = 4 * channels + d_extra
        params = {
            "conv": _conv_trunk_init(k1, shape, channels),
            "mlp": _mlp_init(k2, feat_dim, hidden),
        }

        def logit_fn(p):
            feats = _conv_trunk_apply(p["conv"], x_img, shape)
            feats = jnp.concatenate([x_extra, feats], axis=-1)
            return _mlp_logit(p["mlp"], feats)

        def loss_fn(p):
            ls = optax_sigmoid_ce(logit_fn(p), y)
            return jnp.sum(ls * train_w) / jnp.sum(train_w)

        opt = optax.adam(lr)
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), None

        (params, _), _ = jax.lax.scan(step, (params, state), None, length=epochs)
        pred = (logit_fn(params) > 0).astype(jnp.float32)
        correct = (pred == y).astype(jnp.float32)
        return jnp.sum(correct * test_mask) / jnp.sum(test_mask)

    keys = jax.random.split(rng, folds)
    accs = jax.vmap(run_fold)(jnp.arange(folds), keys)
    return jnp.mean(accs)


# ---------------------------------------------------------------------------
# MMD (evaluate_ropefm.py:283-320 semantics: multiscale / rbf kernels)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kernel",))
def mmd(a: jnp.ndarray, b: jnp.ndarray, kernel: str = "multiscale") -> jnp.ndarray:
    """Squared maximum mean discrepancy between sample sets."""
    d_aa = jnp.sum((a[:, None] - a[None]) ** 2, -1)
    d_bb = jnp.sum((b[:, None] - b[None]) ** 2, -1)
    d_ab = jnp.sum((a[:, None] - b[None]) ** 2, -1)

    def k(d2):
        if kernel == "multiscale":
            out = 0.0
            for s in (0.2, 0.5, 0.9, 1.3):
                out = out + s**2 / (s**2 + d2)
            return out
        if kernel == "rbf":
            out = 0.0
            for s in (10.0, 15.0, 20.0, 50.0):
                out = out + jnp.exp(-0.5 * d2 / s)
            return out
        raise ValueError(kernel)

    return jnp.mean(k(d_aa)) + jnp.mean(k(d_bb)) - 2.0 * jnp.mean(k(d_ab))


# ---------------------------------------------------------------------------
# Wasserstein
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_iters",))
def _sinkhorn_cost(
    a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.05, num_iters: int = 200
) -> jnp.ndarray:
    """Entropic-regularized squared-W2 transport cost (log-domain Sinkhorn)."""
    n, m = a.shape[0], b.shape[0]
    cost = jnp.sum((a[:, None] - b[None]) ** 2, -1)
    scale = jnp.maximum(jnp.mean(cost), 1e-12)
    c = cost / scale
    log_mu = -jnp.log(n) * jnp.ones(n)
    log_nu = -jnp.log(m) * jnp.ones(m)

    def step(carry, _):
        f, g = carry
        f = eps * (log_mu - jax.nn.logsumexp((g[None, :] - c) / eps, axis=1))
        g = eps * (log_nu - jax.nn.logsumexp((f[:, None] - c) / eps, axis=0))
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (jnp.zeros(n), jnp.zeros(m)), None, length=num_iters)
    log_plan = (f[:, None] + g[None, :]) / eps - c / eps + log_mu[:, None] + log_nu[None, :]
    plan = jnp.exp(log_plan)
    plan = plan / jnp.maximum(plan.sum(), 1e-12)
    return jnp.sum(plan * cost)


def sinkhorn_w2(
    a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.05, num_iters: int = 200
) -> jnp.ndarray:
    """Debiased Sinkhorn-divergence estimate of the 2-Wasserstein distance,
    entirely on device (replaces the reference's POT dependency,
    evaluate_ropefm.py:626-629). Debiasing S(a,b) − ½S(a,a) − ½S(b,b)
    removes the entropic offset so identical samples score ~0."""
    ab = _sinkhorn_cost(a, b, eps, num_iters)
    aa = _sinkhorn_cost(a, a, eps, num_iters)
    bb = _sinkhorn_cost(b, b, eps, num_iters)
    return jnp.sqrt(jnp.maximum(ab - 0.5 * (aa + bb), 0.0))


def wasserstein2_exact(a, b) -> float:
    """Exact W2 via Hungarian assignment (equal sizes); scipy host-side.
    Use for validation / small n."""
    from scipy.optimize import linear_sum_assignment

    a, b = np.asarray(a), np.asarray(b)
    n = min(a.shape[0], b.shape[0])
    cost = ((a[:n, None] - b[None, :n]) ** 2).sum(-1)
    r, c = linear_sum_assignment(cost)
    return float(np.sqrt(cost[r, c].mean()))


def ks_test_per_dim(a, b) -> np.ndarray:
    """Per-dimension two-sample KS p-values (the reference's batched-vs-loop
    distribution-equivalence check, benchmark_sample_batched.ipynb cell 13)."""
    from scipy.stats import ks_2samp

    a, b = np.asarray(a), np.asarray(b)
    return np.array([ks_2samp(a[:, d], b[:, d]).pvalue for d in range(a.shape[1])])
