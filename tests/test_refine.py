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


def test_nontraceable_simulator_fallback(est):
    """numpy simulators must work via the host-loop fallback (the reference
    runs simulators un-jitted through simulate_for_sbi, tsnpe_pfn.py:40-77)."""

    def np_sim(key, theta):
        th = np.asarray(theta)  # breaks tracing
        return jnp.asarray(th @ np.asarray(W).T + 1.0)

    refined = est.sample_refined(
        16, X_O, np_sim, rng=jax.random.PRNGKey(7), num_proposals=64,
        max_iters=1,
    )
    assert refined.shape == (16, DIM_THETA)
    assert np.all(np.isfinite(np.asarray(refined)))


def test_jitted_simulator_cached(est):
    """Repeated refinement with the same traceable simulator must reuse the
    compiled vmap (round-4 advisor: per-call jax.jit forced retraces)."""
    est.sample_refined(8, X_O, simulator, rng=jax.random.PRNGKey(8),
                       num_proposals=64, max_iters=1)
    fn1 = est._sim_cache.get(simulator)
    est.sample_refined(8, X_O, simulator, rng=jax.random.PRNGKey(9),
                       num_proposals=64, max_iters=1)
    assert est._sim_cache.get(simulator) is fn1


def test_x_shape_refine_embedding(est):
    """x_shape estimators must reshape simulated observations before the
    embedding net exactly like _prep_obs does for x_o (advisor finding)."""
    seen_shapes = []

    def embed(x):
        seen_shapes.append(tuple(x.shape[1:]))
        return x.reshape(x.shape[0], -1)[:, :2]

    e = NPEPFN(
        prior=est.prior, model=est.model, filter_context_size=64,
        qry_chunk=32, embedding_net=embed, x_shape=(3, 1),
    )
    theta = jax.random.normal(jax.random.PRNGKey(1), (200, DIM_THETA))
    x = jax.vmap(simulator)(jax.random.split(jax.random.PRNGKey(2), 200), theta)
    e.append_simulations(theta, x)
    refined = e.sample_refined(
        16, X_O, simulator, rng=jax.random.PRNGKey(3), num_proposals=64,
        max_iters=1,
    )
    assert refined.shape == (16, DIM_THETA)
    # every embedding call (context, obs, simulated proposals) saw x_shape
    assert set(seen_shapes) == {(3, 1)}


def test_tsnpe_refine_final_budget():
    """run_tsnpe(refine_final=P) must reserve P sims from the round budget
    and return refined samples."""
    from npe_pfn_tpu import distributions as D
    from npe_pfn_tpu.models import TabICAConfig, TabICAModel
    from npe_pfn_tpu.tsnpe import run_tsnpe

    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    prior = D.BoxUniform(low=-3 * jnp.ones(DIM_THETA), high=3 * jnp.ones(DIM_THETA))
    diags = []
    est, samples = run_tsnpe(
        simulator, prior, X_O, num_rounds=2, num_simulations=512,
        rng=jax.random.PRNGKey(1), model=model, filter_context_size=64,
        qry_chunk=32, refine_final=128, refine_num_samples=32,
        num_samples_to_estimate_support=256, collect_diagnostics=diags,
    )
    # rounds split (512 - 128) // 2 = 192 sims each
    assert est.num_simulations == 384
    assert samples.shape == (32, DIM_THETA)
    assert np.all(np.isfinite(np.asarray(samples)))
    assert len(diags) == 1 and "acceptance_rate" in diags[0]
    assert "log_prob_threshold" in diags[0]
    with pytest.raises(ValueError):
        run_tsnpe(simulator, prior, X_O, num_rounds=1, num_simulations=64,
                  model=model, refine_final=64)


def test_harness_refine_mode():
    """evaluate_task(refine_num_proposals=...) records budget accounting and
    rejects joint-only tasks."""
    from npe_pfn_tpu.eval import harness
    from npe_pfn_tpu.tasks import Task
    from npe_pfn_tpu import distributions as D
    from npe_pfn_tpu.models import TabICAModel

    model = TabICAModel.create(jax.random.PRNGKey(0), CFG)
    prior = D.BoxUniform(low=-3 * jnp.ones(DIM_THETA), high=3 * jnp.ones(DIM_THETA))

    def gt_sampler(rng, x_o, n):
        return jax.random.normal(rng, (n, DIM_THETA))

    task = Task("toy", prior, simulator, DIM_THETA, DIM_X,
                posterior_sampler=gt_sampler)
    res = harness.evaluate_task(
        task, num_cal_grid=[64], seeds=[0], num_test=4,
        num_posterior_samples=32, n_obs_eval=2,
        estimator_kwargs={"model": model, "filter_context_size": 64,
                          "qry_chunk": 32},
        refine_num_proposals=128,
    )
    cell = res["cells"]["num_cal=64/seed=0"]
    assert cell["sims_refine_per_obs"] == 128
    assert cell["sims_total_per_obs"] == 64 + 128
    assert cell["refine_ess_mean"] >= 1.0

    joint_task = Task("toy_joint", prior, simulator, DIM_THETA, DIM_X)
    with pytest.raises(ValueError):
        harness.evaluate_task(
            joint_task, num_cal_grid=[64], seeds=[0], num_test=4,
            num_posterior_samples=8,
            estimator_kwargs={"model": model, "filter_context_size": 64,
                              "qry_chunk": 32},
            refine_num_proposals=128,
        )
