"""Feature-side quantile preprocessing ("+featq" spec) tests.

TabPFN's preprocessing ensemble also transforms the INPUT features per
member (SURVEY §2.4); the repo's target-side transform alone leaves skewed
simulator outputs (lotka_volterra/sir-like) on raw scales. These tests pin
the spec-string plumbing, the per-column transform math, and that every
sampling/scoring path (plain, order-ensemble, context-ensemble, serving
cache) accepts and agrees under the flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu import NPEPFN, distributions, preprocessing
from npe_pfn_tpu.models import TabICAConfig, TabICAModel
from npe_pfn_tpu.serving import CachedPosterior

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
    dtype="float32",
)
DIM_THETA, DIM_X = 2, 2


def skewed_sim(key, theta):
    """Heavy-tailed observation scale — the case feature z-scoring handles
    badly and quantile normal-scoring is built for."""
    noise = 0.05 * jax.random.normal(key, (DIM_X,))
    return jnp.exp(theta + noise)  # log-normal x


@pytest.fixture(scope="module")
def data():
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    theta = jax.random.normal(k1, (300, DIM_THETA))
    x = jax.vmap(skewed_sim)(jax.random.split(k2, 300), theta)
    return theta, x


@pytest.fixture(scope="module")
def model():
    return TabICAModel.create(jax.random.PRNGKey(0), CFG)


def make_est(model, data, **kw):
    prior = distributions.BoxUniform(
        low=-3 * jnp.ones(DIM_THETA), high=3 * jnp.ones(DIM_THETA)
    )
    kw.setdefault("filter_context_size", 64)
    kw.setdefault("qry_chunk", 32)
    est = NPEPFN(prior=prior, model=model, feature_transform="quantile", **kw)
    est.append_simulations(*data)
    return est


def test_parse_transform():
    assert preprocessing.parse_transform("zscore") == ("zscore", False)
    assert preprocessing.parse_transform("quantile") == ("quantile", False)
    assert preprocessing.parse_transform("zscore+featq") == ("zscore", True)
    assert preprocessing.parse_transform("quantile+featq") == ("quantile", True)


def test_spec_string_composition(model):
    est = NPEPFN(model=model, feature_transform="quantile")
    assert est.target_transform == "zscore+featq"
    est2 = NPEPFN(model=model, target_transform="quantile",
                  feature_transform="quantile")
    assert est2.target_transform == "quantile+featq"
    with pytest.raises(ValueError):
        NPEPFN(model=model, feature_transform="power")


def test_cols_roundtrip_and_gaussianization():
    """Per-column fit/forward: monotone, invertible, and maps a skewed
    column to approximately standard-normal scores."""
    key = jax.random.PRNGKey(3)
    x = jnp.stack(
        [jnp.exp(jax.random.normal(key, (500,))),       # log-normal
         jax.random.uniform(key, (500,), minval=5, maxval=9)],  # shifted uniform
        axis=1,
    )
    mask = jnp.ones(500, bool)
    qts = preprocessing.quantile_fit_cols(x, mask)
    z = preprocessing.quantile_forward_cols(qts, x)
    assert z.shape == x.shape
    # normal scores: mean ~0, sd ~1, per column — even for the log-normal
    assert np.allclose(np.asarray(jnp.mean(z, axis=0)), 0.0, atol=0.1)
    assert np.allclose(np.asarray(jnp.std(z, axis=0)), 1.0, atol=0.15)
    # monotone in every column
    order_x = jnp.argsort(x[:, 0])
    assert bool(jnp.all(jnp.diff(z[order_x, 0]) >= 0))
    # exact inverse
    x_rt = jax.vmap(preprocessing.quantile_inverse, in_axes=(0, -1),
                    out_axes=-1)(qts, z)
    assert np.allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_sample_and_log_prob_featq(model, data):
    est = make_est(model, data)
    x_o = np.asarray(data[1][0])
    s, lp = est.sample(
        64, x_o, rng=jax.random.PRNGKey(1), max_iters=1, return_log_probs=True
    )
    assert s.shape == (64, DIM_THETA)
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.isfinite(np.asarray(lp)))
    lp2 = est.log_prob(s, x_o, mode="autoregressive")
    assert np.all(np.isfinite(np.asarray(lp2)))


def test_featq_reaches_the_kernel(model, data, monkeypatch):
    """The flag must actually reach the kernels. (A value-level density
    comparison is too weak here: the tiny RANDOM test model is nearly
    feature-insensitive, logit deltas ~1e-4 — on the trained v6 checkpoint
    the same inputs move log-probs by up to ~15 nats. So instead pin that
    the per-column fit is traced into the +featq kernel and NOT into the
    plain one.)"""
    calls = []
    orig = preprocessing.quantile_fit_cols
    monkeypatch.setattr(
        preprocessing, "quantile_fit_cols",
        lambda x, m: (calls.append(1), orig(x, m))[1],
    )
    jax.clear_caches()  # force retrace so the monkeypatch is seen
    est_q = make_est(model, data)
    x_o = np.asarray(data[1][0])
    theta = jnp.linspace(-1, 1, 8)[:, None] * jnp.ones((8, DIM_THETA))
    est_q.log_prob(theta, x_o, mode="autoregressive")
    assert calls, "+featq did not reach autoregressive_log_prob"

    calls.clear()
    est_z = NPEPFN(prior=est_q.prior, model=model, filter_context_size=64,
                   qry_chunk=32)
    est_z.append_simulations(*data)
    est_z.log_prob(theta, x_o, mode="autoregressive")
    assert not calls, "plain zscore kernel must not fit feature transforms"


def test_serving_cache_matches_estimator_featq(model, data):
    """CachedPosterior (decode-only serving path) must score the SAME
    density as the estimator's AR path under +featq."""
    est = make_est(model, data, filter_type="no_filtering")
    x_o = np.asarray(data[1][0])
    cached = CachedPosterior(est, x_o, rng=jax.random.PRNGKey(5))
    theta = jax.random.normal(jax.random.PRNGKey(6), (16, DIM_THETA))
    lp_est = np.asarray(est.log_prob(theta, x_o, mode="autoregressive"))
    lp_cached = np.asarray(cached.log_prob(theta))
    assert np.allclose(lp_est, lp_cached, rtol=1e-4, atol=1e-4)


def test_ensemble_paths_featq(model, data):
    x_o = np.asarray(data[1][0])
    est_o = make_est(model, data, num_order_ensembles=2)
    s = est_o.sample(32, x_o, rng=jax.random.PRNGKey(7), max_iters=1)
    assert np.all(np.isfinite(np.asarray(s)))
    lp = est_o.log_prob(s[:8], x_o, mode="autoregressive")
    assert np.all(np.isfinite(np.asarray(lp)))

    est_e = make_est(model, data, num_ensembles=2)
    s2 = est_e.sample(32, x_o, rng=jax.random.PRNGKey(8), max_iters=1)
    assert np.all(np.isfinite(np.asarray(s2)))
    lp2 = est_e.log_prob(s2[:8], x_o, mode="autoregressive")
    assert np.all(np.isfinite(np.asarray(lp2)))
