"""Metric sanity: same-distribution → null values, different → signal."""

import jax
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
