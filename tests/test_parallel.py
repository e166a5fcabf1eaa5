"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.models import TabICAConfig, TabICAModel
from npe_pfn_tpu.parallel import get_mesh, sharded_autoregressive_sample


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_sampling_matches_single_device():
    """Sharding the query axis must not change results (same PRNG path)."""
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    theta_ctx = jax.random.normal(k1, (64, 2))
    x_ctx = jax.random.normal(k2, (64, 3))
    ctx_mask = jnp.ones((64,), bool)
    x_qry = jax.random.normal(k3, (64, 3))

    from npe_pfn_tpu.estimator import autoregressive_sample

    ref, ref_lp = autoregressive_sample(
        model, theta_ctx, x_ctx, ctx_mask, x_qry, jax.random.PRNGKey(4), 16
    )
    mesh = get_mesh(4)
    out, out_lp = sharded_autoregressive_sample(
        mesh, model, theta_ctx, x_ctx, ctx_mask, x_qry, jax.random.PRNGKey(4),
        qry_chunk=16,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)
