"""Feature-width slicing must be EXACT (estimator._eff_features).

TabICA has no positional feature embeddings; inactive columns are zeroed
at embedding and masked as attention keys, and row attention is
per-column — so the AR kernels computing with only the first dx+dθ
(rounded to 8) columns must produce bit-comparable results to the full
padded width. These tests pin that equality through all four kernels and
the public estimator API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu import NPEPFN, estimator
from npe_pfn_tpu.models import TabICAConfig, TabICAModel


@pytest.fixture(scope="module")
def setup():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=32,
        num_bars=32, dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    theta = jax.random.normal(k1, (128, 3))
    x = theta @ jnp.ones((3, 4)) + 0.1 * jax.random.normal(k2, (128, 4))
    return model, theta, x  # dx+dth = 7 -> sliced width 8 vs full 32


def test_eff_features_rounding(setup):
    model, _, _ = setup
    assert estimator._eff_features(model, 4, 3) == 8
    assert estimator._eff_features(model, 10, 10) == 24
    assert estimator._eff_features(model, 30, 10) == 32  # capped at full


@pytest.mark.parametrize("transform", ["zscore", "quantile"])
def test_sample_and_log_prob_exact_vs_full_width(setup, transform):
    model, theta, x = setup
    ctx_mask = jnp.ones((128,), bool)
    xq = jnp.tile(x[:1], (64, 1))
    kw = dict(qry_chunk=64, target_transform=transform)
    s_sliced, lp_sliced = estimator.autoregressive_sample(
        model, theta, x, ctx_mask, xq, jax.random.PRNGKey(3), **kw
    )
    s_full, lp_full = estimator.autoregressive_sample(
        model, theta, x, ctx_mask, xq, jax.random.PRNGKey(3),
        feature_width=32, **kw
    )
    np.testing.assert_allclose(np.asarray(s_sliced), np.asarray(s_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_sliced), np.asarray(lp_full),
                               rtol=1e-4, atol=1e-4)

    th_eval = s_full
    a = estimator.autoregressive_log_prob(
        model, theta, x, ctx_mask, xq, th_eval, **kw
    )
    b = estimator.autoregressive_log_prob(
        model, theta, x, ctx_mask, xq, th_eval, feature_width=32, **kw
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_ensemble_kernels_exact_vs_full_width(setup):
    model, theta, x = setup
    e = 2
    theta_e = theta.reshape(e, 64, 3)
    x_e = x.reshape(e, 64, 4)
    cm = jnp.ones((e, 64), bool)
    xq = jnp.tile(x[:1], (64, 1))
    s1, lp1 = estimator.autoregressive_sample_ensemble(
        model, theta_e, x_e, cm, xq, jax.random.PRNGKey(5), qry_chunk=64
    )
    s2, lp2 = estimator.autoregressive_sample_ensemble(
        model, theta_e, x_e, cm, xq, jax.random.PRNGKey(5), qry_chunk=64,
        feature_width=32,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
    a = estimator.autoregressive_log_prob_ensemble(
        model, theta_e, x_e, cm, xq, s2, qry_chunk=64
    )
    b = estimator.autoregressive_log_prob_ensemble(
        model, theta_e, x_e, cm, xq, s2, qry_chunk=64, feature_width=32
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_public_api_unchanged_distribution(setup):
    """NPEPFN.sample/log_prob ride the sliced kernels; results must be
    finite, correctly shaped, and log_prob consistent with sampling."""
    model, theta, x = setup
    from npe_pfn_tpu.distributions import BoxUniform

    prior = BoxUniform(-5 * jnp.ones(3), 5 * jnp.ones(3))
    est = NPEPFN(prior=prior, model=model, filter_context_size=64, qry_chunk=64)
    est.append_simulations(theta, x)
    s = est.sample(64, x=x[0], rng=jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(s)).all() and s.shape == (64, 3)
    lp = est.log_prob(s, x=x[0])
    assert np.isfinite(np.asarray(lp)).all()


@pytest.mark.parametrize("transform", ["zscore", "zscore+featq", "quantile"])
def test_prefix_width_scan_exact_vs_single_scan(transform):
    """The prefix-width-specialized scan (identity order, feature_width
    None, multiple distinct per-step widths) must equal the single
    full-width scan exactly: same keys, masked == removed columns
    (serving-perf lever, results/round8/profile_serve.jsonl)."""
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=32,
        num_bars=32, dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    dth, dx = 10, 10  # widths 16 (steps 0-6) then 24 (steps 7-9)
    theta = jax.random.normal(k1, (96, dth))
    x = theta @ jax.random.normal(jax.random.PRNGKey(2), (dth, dx)) / 3 \
        + 0.1 * jax.random.normal(k2, (96, dx))
    ctx_mask = jnp.ones((96,), bool)
    xq = jnp.tile(x[:1], (64, 1))
    kw = dict(qry_chunk=64, target_transform=transform)
    s_seg, lp_seg = estimator.autoregressive_sample(
        model, theta, x, ctx_mask, xq, jax.random.PRNGKey(3), **kw
    )
    s_one, lp_one = estimator.autoregressive_sample(
        model, theta, x, ctx_mask, xq, jax.random.PRNGKey(3),
        feature_width=24, **kw
    )
    np.testing.assert_allclose(np.asarray(s_seg), np.asarray(s_one),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_seg), np.asarray(lp_one),
                               rtol=1e-4, atol=1e-4)
    a = estimator.autoregressive_log_prob(
        model, theta, x, ctx_mask, xq, s_one, **kw
    )
    b = estimator.autoregressive_log_prob(
        model, theta, x, ctx_mask, xq, s_one, feature_width=24, **kw
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
