"""Bar-distribution numerics: density integrates to 1, sampling matches
log_prob, cdf/icdf roundtrip. These are the contracts the reference relies on
via TabPFN's criterion (reference: npe_pfn.py:146-151)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.models import bar_distribution as bar


@pytest.fixture(scope="module")
def setup():
    borders = bar.make_borders(64, 4.0)
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (64,)) * 2.0
    return borders, logits


@pytest.mark.fast
def test_borders_shape_and_monotonic(setup):
    borders, _ = setup
    assert borders.shape == (65,)
    assert np.all(np.diff(np.asarray(borders)) > 0)
    assert np.isclose(borders[0], -4.0) and np.isclose(borders[-1], 4.0)


def test_density_integrates_to_one(setup):
    borders, logits = setup
    ys = jnp.linspace(-25.0, 25.0, 200_001)
    dens = jnp.exp(bar.log_prob(borders, logits, ys))
    integral = jnp.trapezoid(dens, ys)
    assert np.isclose(float(integral), 1.0, atol=1e-3)


@pytest.mark.fast
def test_log_prob_finite_everywhere(setup):
    borders, logits = setup
    ys = jnp.array([-1e3, -4.0, 0.0, 3.999, 4.0, 1e3])
    lp = bar.log_prob(borders, logits, ys)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_samples_match_density(setup):
    borders, logits = setup
    samples = bar.sample(jax.random.PRNGKey(1), borders, jnp.tile(logits, (200_000, 1)))
    samples = np.asarray(samples)
    # Empirical CDF at a few points vs analytic CDF.
    for q in [-2.0, -0.5, 0.0, 0.7, 2.5]:
        emp = (samples < q).mean()
        ana = float(bar.cdf(borders, logits, jnp.array(q)))
        assert abs(emp - ana) < 0.01, (q, emp, ana)


def test_mean_matches_samples(setup):
    borders, logits = setup
    samples = bar.sample(jax.random.PRNGKey(2), borders, jnp.tile(logits, (200_000, 1)))
    ana = float(bar.mean(borders, logits))
    assert abs(float(np.mean(np.asarray(samples))) - ana) < 0.02


@pytest.mark.fast
def test_icdf_cdf_roundtrip(setup):
    borders, logits = setup
    qs = jnp.array([0.01, 0.1, 0.5, 0.9, 0.99])
    ys = bar.icdf(borders, logits, qs)
    back = bar.cdf(borders, logits, ys)
    np.testing.assert_allclose(np.asarray(back), np.asarray(qs), atol=5e-3)


@pytest.mark.fast
def test_nll_is_negative_log_prob(setup):
    borders, logits = setup
    y = jnp.array([0.3])
    np.testing.assert_allclose(
        np.asarray(bar.nll(borders, logits, y)),
        -np.asarray(bar.log_prob(borders, logits, y)),
    )
