"""Metric sanity: same-distribution → null values, different → signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.eval import metrics


@pytest.fixture(scope="module")
def samples():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    a = jax.random.normal(k1, (500, 3))
    b = jax.random.normal(k2, (500, 3))
    c = jax.random.normal(k3, (500, 3)) + 2.0  # shifted
    return a, b, c


def test_c2st_null_and_signal(samples):
    a, b, c = samples
    null = float(metrics.c2st(jax.random.PRNGKey(1), a, b, epochs=150))
    sig = float(metrics.c2st(jax.random.PRNGKey(1), a, c, epochs=150))
    assert 0.40 <= null <= 0.62, null
    assert sig > 0.9, sig


@pytest.mark.fast
def test_c2st_paired_joint_diagnostic():
    """Joint diagnostic {(θ̂, x)} vs {(θ*, x)}: every x appears in both
    classes. With row-level folds the classifier memorizes x's train label
    and scores BELOW chance on the partner copy (the round-3 grid artifact:
    wind_tunnel joint C2ST 0.24 on a good posterior); group-paired folds
    restore ≈0.5 for indistinguishable θ and keep full power for distinct θ."""
    k = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    n = 400
    x = jax.random.normal(k1, (n, 4))
    th_a = jax.random.normal(k2, (n, 2))
    th_b = jax.random.normal(k3, (n, 2))  # same distribution as th_a
    a = jnp.concatenate([th_a, x], axis=1)
    b = jnp.concatenate([th_b, x], axis=1)
    plain = float(metrics.c2st(k4, a, b))
    paired = float(metrics.c2st(k4, a, b, paired=True))
    assert plain < 0.45, plain  # demonstrates the pathology
    assert 0.4 < paired < 0.6, paired
    # distinguishable θ must still be detected under paired folds
    b_shift = jnp.concatenate([th_b + 3.0, x], axis=1)
    assert float(metrics.c2st(k4, a, b_shift, paired=True)) > 0.9


def test_mmd_null_and_signal(samples):
    a, b, c = samples
    for kernel in ("multiscale", "rbf"):
        null = float(metrics.mmd(a, b, kernel=kernel))
        sig = float(metrics.mmd(a, c, kernel=kernel))
        assert sig > null * 5, (kernel, null, sig)


@pytest.mark.fast
def test_sinkhorn_matches_exact(samples):
    a, b, c = samples
    approx = float(metrics.sinkhorn_w2(a[:200], c[:200]))
    exact = metrics.wasserstein2_exact(a[:200], c[:200])
    assert abs(approx - exact) / exact < 0.15, (approx, exact)


def test_sinkhorn_zero_for_identical(samples):
    a, *_ = samples
    d = float(metrics.sinkhorn_w2(a[:200], a[:200]))
    assert d < 0.25, d


@pytest.mark.fast
def test_ks_per_dim(samples):
    a, b, c = samples
    p_null = metrics.ks_test_per_dim(a, b)
    p_sig = metrics.ks_test_per_dim(a, c)
    assert (p_null > 0.05).mean() >= 2 / 3
    assert np.all(p_sig < 0.01)


def test_c2st_embedded(samples):
    import npe_pfn_tpu as npt

    a, b, c = samples
    emb = npt.embeddings.RandomProjectionEmbedding(3, 3, seed=0, standardize=False)
    null = float(metrics.c2st_embedded(jax.random.PRNGKey(2), a, b, emb, epochs=100))
    sig = float(metrics.c2st_embedded(jax.random.PRNGKey(2), a, c, emb, epochs=100))
    assert null < 0.65 and sig > 0.85


def _bump_images(rng, n, shift=0.0, size=16):
    """Gaussian bumps at random centers; `shift` translates distribution b."""
    k1, k2 = jax.random.split(rng)
    centers = jax.random.uniform(k1, (n, 2), minval=4.0, maxval=size - 4.0) + shift
    ii = jnp.arange(size)
    grid = ii[None, :, None] - centers[:, 0][:, None, None]
    gj = ii[None, None, :] - centers[:, 1][:, None, None]
    img = jnp.exp(-(grid**2 + gj**2) / 8.0)
    img = img + 0.05 * jax.random.normal(k2, (n, size, size))
    return img.reshape(n, -1)


def test_c2st_conv_2d_null_and_power():
    """Trained conv discriminator (reference ConvNN2DLT analog,
    evaluate_ropefm_batched.py:198-230): ~0.5 on identical image
    distributions, high on a translated one."""
    k = jax.random.PRNGKey(0)
    a = _bump_images(jax.random.fold_in(k, 0), 150)
    b = _bump_images(jax.random.fold_in(k, 1), 150)
    # shift=5: center distributions overlap (3/8)^2 ≈ 14% → Bayes-optimal
    # accuracy ≈ 0.93, leaving headroom over the 0.8 assertion.
    c = _bump_images(jax.random.fold_in(k, 2), 150, shift=5.0)
    null = float(metrics.c2st_conv(jax.random.PRNGKey(3), a, b, shape=(16, 16), epochs=120))
    sig = float(metrics.c2st_conv(jax.random.PRNGKey(3), a, c, shape=(16, 16), epochs=120))
    assert null < 0.65, null
    assert sig > 0.8, sig


def test_c2st_conv_1d_with_extra_dims():
    """1D conv trunk + plain θ columns (reference's embedding-aware joint
    classifier, evaluate_ropefm_batched.py:255-304): discrepancy carried
    ONLY by the θ columns must still be detected."""
    k = jax.random.PRNGKey(1)
    n, L = 150, 64
    t = jnp.linspace(0, 1, L)
    freq = jax.random.uniform(jax.random.fold_in(k, 0), (2 * n, 1), minval=2.0, maxval=6.0)
    sig = jnp.sin(2 * jnp.pi * freq * t[None, :])
    sig = sig + 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (2 * n, L))
    th_a = jax.random.normal(jax.random.fold_in(k, 2), (n, 2))
    th_c = jax.random.normal(jax.random.fold_in(k, 3), (n, 2)) + 2.0
    a = jnp.concatenate([th_a, sig[:n]], axis=1)
    c = jnp.concatenate([th_c, sig[n:]], axis=1)
    acc = float(metrics.c2st_conv(jax.random.PRNGKey(4), a, c, shape=(L,), d_extra=2, epochs=120))
    assert acc > 0.8, acc
