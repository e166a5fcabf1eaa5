"""Quantile target-transform tests: bijection round-trip, Jacobian
correctness (vs autodiff), z-score degeneracy on Gaussian data, and the
sample/log_prob consistency of the quantile-mode autoregressive kernels
(TabPFN preprocessing-ensemble variant, SURVEY §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu import preprocessing as pp
from npe_pfn_tpu.estimator import (
    autoregressive_log_prob,
    autoregressive_sample,
    autoregressive_log_prob_ensemble,
    autoregressive_sample_ensemble,
    split_context_ensemble,
)
from npe_pfn_tpu.models import TabICAConfig, TabICAModel

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32, dtype="float32"
)


@pytest.fixture(scope="module")
def model():
    return TabICAModel.create(jax.random.PRNGKey(0), CFG)


def _fit(n=200, num_knots=32, dist="mixture"):
    rng = np.random.default_rng(0)
    if dist == "mixture":
        y = np.where(
            rng.random(n) < 0.5, rng.normal(-2, 0.1, n), rng.normal(3, 0.5, n)
        )
    else:
        y = rng.normal(1.5, 2.0, n)
    mask = np.ones(n, bool)
    mask[-20:] = False  # padded tail must be ignored
    y[-20:] = 1e6
    return pp.quantile_fit(jnp.asarray(y, jnp.float32), jnp.asarray(mask), num_knots), y, mask


def test_round_trip_and_monotone():
    qt, _, _ = _fit()
    z_grid = jnp.linspace(-6.0, 6.0, 301)
    y = pp.quantile_inverse(qt, z_grid)
    assert bool(jnp.all(jnp.diff(y) > 0)), "inverse must be strictly increasing"
    z_back = pp.quantile_forward(qt, y)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z_grid), atol=1e-4)
    # and the other direction, including points outside the context range
    y_grid = jnp.linspace(-10.0, 10.0, 301)
    np.testing.assert_allclose(
        np.asarray(pp.quantile_inverse(qt, pp.quantile_forward(qt, y_grid))),
        np.asarray(y_grid),
        atol=1e-3,
    )


def test_log_det_matches_autodiff():
    qt, _, _ = _fit()
    y = jnp.asarray([-3.0, -2.05, -1.0, 0.5, 2.8, 3.3, 7.0])  # spans tails+core
    ld = pp.quantile_log_det(qt, y)
    # autodiff through the piecewise-linear forward gives the same slopes
    # (evaluation points chosen off the knots)
    grads = jax.vmap(jax.grad(lambda v: pp.quantile_forward(qt, v)))(y)
    np.testing.assert_allclose(np.asarray(ld), np.log(np.asarray(grads)), atol=1e-4)


def test_gaussian_data_approximates_zscore():
    qt, y, mask = _fit(n=2000, num_knots=64, dist="gauss")
    yv = y[mask]
    mu, sd = yv.mean(), yv.std()
    grid = jnp.asarray(np.linspace(mu - 1.5 * sd, mu + 1.5 * sd, 41), jnp.float32)
    z = np.asarray(pp.quantile_forward(qt, grid))
    np.testing.assert_allclose(z, (np.asarray(grid) - mu) / sd, atol=0.15)


def test_transform_spreads_thin_mode():
    """The point of the transform: a thin mode occupying ~1% of the θ-range
    gets a large share of z-space (adaptive bar resolution)."""
    qt, _, _ = _fit()  # mode 1 is N(-2, 0.1) — thin vs full range [-2.3, 4]
    width_theta = 0.4  # ±2σ of the thin mode
    z_span = pp.quantile_forward(qt, jnp.asarray(-1.8)) - pp.quantile_forward(
        qt, jnp.asarray(-2.2)
    )
    # under a plain z-score with sd≈2.6 this span would be ~0.15 z-units
    assert float(z_span) > 1.0, f"thin mode got only {float(z_span):.3f} z-units"
    del width_theta


def test_kernel_sample_log_prob_consistency(model):
    rng = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    n, dth, dx, q = 64, 2, 3, 32
    theta_ctx = jax.random.normal(k1, (n, dth))
    x_ctx = jax.random.normal(k2, (n, dx))
    ctx_mask = jnp.arange(n) < 56
    x_qry = jnp.broadcast_to(jax.random.normal(k3, (dx,)), (q, dx))
    theta, lp = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, k4, q, "quantile"
    )
    assert np.isfinite(np.asarray(lp)).all()
    lp2 = autoregressive_log_prob(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, theta, q, "quantile"
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-4, atol=1e-4)
    # quantile mode must actually change the draw vs zscore
    theta_z, _ = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, k4, q, "zscore"
    )
    assert not np.allclose(np.asarray(theta), np.asarray(theta_z))


def test_ensemble_kernel_consistency(model):
    rng = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    n, dth, dx, q = 64, 2, 3, 32
    theta_ctx = jax.random.normal(k1, (n, dth))
    x_ctx = jax.random.normal(k2, (n, dx))
    ctx_mask = jnp.ones((n,), bool)
    tc, xc, cm = split_context_ensemble(theta_ctx, x_ctx, ctx_mask, 2)
    x_qry = jnp.broadcast_to(jax.random.normal(k3, (dx,)), (q, dx))
    theta, lp = autoregressive_sample_ensemble(
        model, tc, xc, cm, x_qry, k4, q, "quantile"
    )
    assert np.isfinite(np.asarray(lp)).all()
    lp2 = autoregressive_log_prob_ensemble(
        model, tc, xc, cm, x_qry, theta, q, "quantile"
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-4, atol=1e-4)


def test_estimator_end_to_end_quantile(model):
    from npe_pfn_tpu import NPEPFN, distributions

    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, (3, 2))
    theta = jax.random.normal(k2, (300, 2))
    x = theta @ w.T + 0.1 * jax.random.normal(k3, (300, 3)) + 1.0
    prior = distributions.BoxUniform(low=-3 * jnp.ones(2), high=3 * jnp.ones(2))
    est = NPEPFN(
        prior=prior, model=model, filter_context_size=64, qry_chunk=32,
        ratio_context_size=64, target_transform="quantile",
    )
    est.append_simulations(theta, x)
    s, lp = est.sample(50, x[0], return_log_probs=True)
    assert s.shape == (50, 2) and np.isfinite(np.asarray(lp)).all()
    lps = est.log_prob(s, x[0], mode="autoregressive")
    assert np.isfinite(np.asarray(lps)).all()
    with pytest.raises(ValueError):
        NPEPFN(model=model, target_transform="bogus")
