"""sample_refined (posterior-predictive ABC-SIR refinement) tests.

Machinery-level checks on a linear-Gaussian toy: refinement must pull the
proposal cloud toward simulations that match the observation, honor both
kernels, guard degenerate weights, and surface diagnostics. The
statistical headline (two_moons C2ST 0.898→0.683) is measured on the real
checkpoint by scripts/refine_quality.py, not here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu import NPEPFN, distributions
from npe_pfn_tpu.models import TabICAConfig, TabICAModel

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32, dtype="float32"
)
DIM_THETA, DIM_X = 2, 3
W = jax.random.normal(jax.random.PRNGKey(42), (DIM_X, DIM_THETA))


def simulator(key, theta):
    return theta @ W.T + 1.0 + 0.05 * jax.random.normal(key, (DIM_X,))


@pytest.fixture(scope="module")
def est():
    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    theta = jax.random.normal(k1, (300, DIM_THETA))
    x = jax.vmap(simulator)(jax.random.split(k2, 300), theta)
    prior = distributions.BoxUniform(
        low=-3 * jnp.ones(DIM_THETA), high=3 * jnp.ones(DIM_THETA)
    )
    e = NPEPFN(prior=prior, model=model, filter_context_size=64, qry_chunk=32)
    e.append_simulations(theta, x)
    return e


X_O = np.asarray(jax.vmap(simulator)(
    jax.random.split(jax.random.PRNGKey(9), 1), jnp.zeros((1, DIM_THETA)))[0])


def _sim_distance(theta, rng):
    x_sim = jax.vmap(simulator)(jax.random.split(rng, theta.shape[0]), theta)
    return float(jnp.mean(jnp.linalg.norm(x_sim - X_O[None, :], axis=-1)))


def test_refined_concentrates(est):
    rng = jax.random.PRNGKey(3)
    proposals = est.sample(256, X_O, rng=rng, max_iters=1)
    refined = est.sample_refined(
        256, X_O, simulator, rng=rng, num_proposals=1024,
        eps_quantile=0.05, max_iters=1,
    )
    assert refined.shape == (256, DIM_THETA)
    assert np.all(np.isfinite(np.asarray(refined)))
    d_prop = _sim_distance(proposals, jax.random.PRNGKey(11))
    d_ref = _sim_distance(refined, jax.random.PRNGKey(11))
    assert d_ref < d_prop  # predictive mismatch must shrink
    diag = est.last_refine_diagnostics
    assert 1.0 <= diag["ess"] <= 1024
    assert diag["num_proposals"] == 1024
    assert not diag["fallback_uniform"]


def test_hard_kernel_and_degenerate_guard(est):
    rng = jax.random.PRNGKey(4)
    refined = est.sample_refined(
        64, X_O, simulator, rng=rng, num_proposals=256,
        kernel="hard", eps=1e9, max_iters=1,
    )
    assert refined.shape == (64, DIM_THETA)
    # eps=inf accepts everything: ESS == num_proposals (uniform weights)
    assert est.last_refine_diagnostics["ess"] == pytest.approx(256, rel=1e-3)
    # eps below every distance: degenerate -> uniform fallback, flagged
    refined2 = est.sample_refined(
        64, X_O, simulator, rng=rng, num_proposals=256,
        kernel="hard", eps=1e-9, max_iters=1,
    )
    assert refined2.shape == (64, DIM_THETA)
    assert est.last_refine_diagnostics["fallback_uniform"]


def test_importance_correct_runs(est):
    refined = est.sample_refined(
        64, X_O, simulator, rng=jax.random.PRNGKey(5), num_proposals=256,
        importance_correct=True, max_iters=1,
    )
    assert np.all(np.isfinite(np.asarray(refined)))


def test_validation_errors(est):
    with pytest.raises(ValueError):
        est.sample_refined(8, X_O, simulator, kernel="box")
    fresh = NPEPFN(prior=est.prior, model=est.model)
    with pytest.raises(RuntimeError):
        fresh.sample_refined(8, X_O, simulator)
