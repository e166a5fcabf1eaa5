"""CachedPosterior must reproduce the uncached kernel exactly."""

import jax
import jax.numpy as jnp
import numpy as np

import npe_pfn_tpu as npt
from npe_pfn_tpu.estimator import autoregressive_sample
from npe_pfn_tpu.models import TabICAConfig, TabICAModel
from npe_pfn_tpu.serving import CachedPosterior

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32, dtype="float32"
)


def test_cached_posterior_matches_uncached():
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(ks[0], (200, 2))
    x = theta @ jax.random.normal(ks[1], (3, 2)).T + 0.1 * jax.random.normal(ks[2], (200, 3))

    est = npt.NPEPFN(model=model, filter_context_size=64, qry_chunk=32,
                     filter_type="standardized_euclidean_filtering")
    est.append_simulations(theta, x)
    x_o = x[0]

    # Same filtered context on both paths: fix the filter rng.
    ctx_rng = jax.random.PRNGKey(5)
    theta_ctx, x_ctx, ctx_mask = est.get_context(x_o, ctx_rng)

    key = jax.random.PRNGKey(7)
    x_qry = jnp.broadcast_to(x_o, (32, 3))
    ref_theta, ref_lp = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, key, 32
    )

    cp = CachedPosterior(est, x_o, rng=ctx_rng)
    out_theta, out_lp = cp.sample(32, rng=key, return_log_probs=True)
    np.testing.assert_allclose(np.asarray(out_theta), np.asarray(ref_theta), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_lp), np.asarray(ref_lp), rtol=2e-4, atol=2e-4)

    # log_prob through the cache agrees with the estimator's AR path on the
    # same context.
    lp_cached = cp.log_prob(out_theta[:8])
    from npe_pfn_tpu.estimator import autoregressive_log_prob

    lp_ref = autoregressive_log_prob(
        model, theta_ctx, x_ctx, ctx_mask, x_qry,
        jnp.concatenate([out_theta[:8], jnp.zeros((24, 2))], axis=0), 32
    )[:8]
    np.testing.assert_allclose(np.asarray(lp_cached), np.asarray(lp_ref), rtol=2e-4, atol=2e-4)


def test_cached_posterior_quantile_matches_uncached():
    """Quantile-mode serving parity vs the quantile-mode AR kernel."""
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    theta = jax.random.normal(ks[0], (200, 2))
    x = theta @ jax.random.normal(ks[1], (3, 2)).T + 0.1 * jax.random.normal(ks[2], (200, 3))

    est = npt.NPEPFN(model=model, filter_context_size=64, qry_chunk=32,
                     target_transform="quantile")
    est.append_simulations(theta, x)
    x_o = x[1]
    ctx_rng = jax.random.PRNGKey(6)
    theta_ctx, x_ctx, ctx_mask = est.get_context(x_o, ctx_rng)
    key = jax.random.PRNGKey(8)
    x_qry = jnp.broadcast_to(x_o, (32, 3))
    ref_theta, ref_lp = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, key, 32, "quantile"
    )
    cp = CachedPosterior(est, x_o, rng=ctx_rng)
    out_theta, out_lp = cp.sample(32, rng=key, return_log_probs=True)
    np.testing.assert_allclose(np.asarray(out_theta), np.asarray(ref_theta), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_lp), np.asarray(ref_lp), rtol=2e-4, atol=2e-4)
    lp_cached = cp.log_prob(out_theta[:8])
    np.testing.assert_allclose(np.asarray(lp_cached), np.asarray(out_lp[:8]), rtol=2e-3, atol=2e-3)
