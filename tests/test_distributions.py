"""Distribution protocol correctness vs scipy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from npe_pfn_tpu import distributions as D


@pytest.mark.fast
def test_box_uniform():
    d = D.BoxUniform(low=jnp.array([-1.0, 0.0]), high=jnp.array([1.0, 4.0]))
    s = d.sample(jax.random.PRNGKey(0), (5000,))
    assert s.shape == (5000, 2)
    assert bool(d.support_check(s).all())
    np.testing.assert_allclose(float(d.log_prob(s[0])), -np.log(2.0 * 4.0), rtol=1e-6)
    assert float(d.log_prob(jnp.array([2.0, 1.0]))) == -np.inf
    lo, hi = d.bounds()
    np.testing.assert_array_equal(np.asarray(lo), [-1.0, 0.0])


@pytest.mark.fast
def test_normal_log_prob_matches_scipy():
    d = D.Normal(loc=jnp.array([1.0, -2.0]), scale=jnp.array([0.5, 3.0]))
    x = np.array([[0.3, 0.7], [1.5, -4.0]])
    ours = np.asarray(d.log_prob(jnp.asarray(x)))
    ref = scipy.stats.norm.logpdf(x, [1.0, -2.0], [0.5, 3.0]).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.fast
def test_mvn_log_prob_matches_scipy():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    d = D.MultivariateNormal(loc=jnp.array([1.0, -1.0]), cov=jnp.asarray(cov))
    x = np.array([[0.0, 0.0], [2.0, -1.5]])
    ours = np.asarray(d.log_prob(jnp.asarray(x)))
    ref = scipy.stats.multivariate_normal.logpdf(x, [1.0, -1.0], cov)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    s = d.sample(jax.random.PRNGKey(1), (20000,))
    np.testing.assert_allclose(np.cov(np.asarray(s).T), cov, atol=0.06)


@pytest.mark.fast
def test_logistic_log_prob_matches_scipy():
    d = D.Logistic(loc=jnp.array([0.0]), scale=jnp.array([2.0]))
    x = np.array([[0.5], [-3.0]])
    ours = np.asarray(d.log_prob(jnp.asarray(x)))
    ref = scipy.stats.logistic.logpdf(x, 0.0, 2.0).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    s = np.asarray(d.sample(jax.random.PRNGKey(2), (50000,)))
    np.testing.assert_allclose(s.mean(), 0.0, atol=0.05)
    np.testing.assert_allclose(s.std(), 2.0 * np.pi / np.sqrt(3.0), rtol=0.03)


@pytest.mark.fast
def test_truncated_by_bounds():
    base = D.Normal(loc=jnp.zeros(1), scale=jnp.ones(1))
    t = D.TruncatedByBounds(base=base, low=jnp.array([0.0]), high=jnp.array([1.0]))
    assert float(t.log_prob(jnp.array([0.5]))) == float(base.log_prob(jnp.array([0.5])))
    assert float(t.log_prob(jnp.array([2.0]))) == -np.inf
    assert not bool(t.support_check(jnp.array([-0.5])))


@pytest.mark.fast
def test_truncated_by_bounds_sample():
    """Rejection sampling lands inside the box and matches the truncated
    density (mean of N(0,1) truncated to [0,1] ≈ 0.4598)."""
    base = D.Normal(loc=jnp.zeros(1), scale=jnp.ones(1))
    t = D.TruncatedByBounds(base=base, low=jnp.array([0.0]), high=jnp.array([1.0]))
    s = np.asarray(t.sample(jax.random.PRNGKey(0), (20000,)))
    assert s.shape == (20000, 1)
    assert s.min() >= 0.0 and s.max() <= 1.0
    np.testing.assert_allclose(s.mean(), 0.4598, atol=0.02)


@pytest.mark.fast
def test_intersect_boxes():
    a = D.BoxUniform(low=jnp.array([-2.0]), high=jnp.array([2.0]))
    inter = D.intersect_boxes(a, jnp.array([0.0]), jnp.array([5.0]))
    np.testing.assert_array_equal(np.asarray(inter.low), [0.0])
    np.testing.assert_array_equal(np.asarray(inter.high), [2.0])


@pytest.mark.fast
def test_logit_box_bijection_pushforward():
    """BoxUniform pushed through LogitBoxBijection is Logistic(0,1) — the
    reference's transformed-space prior contract (evaluate_ropefm.py:405-433)."""
    from npe_pfn_tpu.distributions import LogitBoxBijection, Logistic, BoxUniform

    low = jnp.array([0.0, 0.5])
    high = jnp.array([3.0, 10.0])
    bij = LogitBoxBijection(low=low, high=high)
    box = BoxUniform(low=low, high=high)
    theta = box.sample(jax.random.PRNGKey(0), (2000,))
    z = bij.forward(theta)
    # round trip
    np.testing.assert_allclose(np.asarray(bij.inverse(z)), np.asarray(theta),
                               rtol=1e-5, atol=1e-5)
    # change of variables: p_z(z) = p_theta(theta) / |dz/dtheta|
    logi = Logistic(loc=jnp.zeros(2), scale=jnp.ones(2))
    lhs = np.asarray(logi.log_prob(z))
    rhs = np.asarray(box.log_prob(theta) - bij.forward_log_det(theta))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)
    # distributional check: empirical mean/std of z match Logistic(0,1)
    assert abs(float(z.mean())) < 0.1
    assert abs(float(z.std()) - 1.8138) < 0.1  # logistic sd = pi/sqrt(3)
