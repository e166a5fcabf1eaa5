"""Trained-NPE baseline (conditional coupling flow) sanity tests.

The baseline exists to reproduce the reference's headline comparison
(demo.ipynb cell 4: an sbi flow needs ~214 training epochs; NPE-PFN needs
none) — so the tests check it actually learns a conditional posterior on a
linear-Gaussian task where the answer is known analytically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.baselines import FlowNPE
from npe_pfn_tpu.tasks import get_task


@pytest.mark.fast
def test_flow_npe_learns_linear_gaussian():
    task = get_task("gaussian_linear", dim=2)
    theta, x = task.simulate(jax.random.PRNGKey(0), 2000)
    flow = FlowNPE(dim_theta=2, dim_x=2, max_epochs=150, patience=15, seed=0)
    epochs = flow.fit(theta, x)
    assert 1 <= epochs <= 150

    x_o = jnp.array([0.8, -0.5])
    s = np.asarray(flow.sample(4000, x_o, rng=jax.random.PRNGKey(1)))
    gt = np.asarray(task.posterior_sampler(jax.random.PRNGKey(2), x_o, 4000))
    # Posterior mean within a few posterior-sds, width within 35%.
    assert np.abs(s.mean(0) - gt.mean(0)).max() < 3.5 * gt.std(0).max()
    assert np.all(np.abs(s.std(0) / gt.std(0) - 1.0) < 0.35), (s.std(0), gt.std(0))

    # log_prob is a normalized density in θ space: posterior samples score
    # near the exact density (offset-free comparison).
    lp = np.asarray(flow.log_prob(jnp.asarray(gt[:512]), x_o))
    exact = np.asarray(task.posterior_log_prob(x_o, jnp.asarray(gt[:512])))
    assert np.isfinite(lp).all()
    assert np.abs(np.mean(lp - exact)) < 0.5, np.mean(lp - exact)


@pytest.mark.fast
def test_flow_npe_sample_log_prob_consistency():
    """exp(log_prob) integrates to ~1 over a grid (1D check)."""
    task = get_task("gaussian_linear", dim=1)
    theta, x = task.simulate(jax.random.PRNGKey(3), 1500)
    flow = FlowNPE(dim_theta=1, dim_x=1, max_epochs=100, patience=12, seed=1)
    flow.fit(theta, x)
    x_o = jnp.array([0.3])
    g = jnp.linspace(-4.0, 4.0, 2001)[:, None]
    lp = np.asarray(flow.log_prob(g, x_o))
    integral = float(np.trapezoid(np.exp(lp), np.asarray(g[:, 0])))
    assert abs(integral - 1.0) < 0.05, integral
