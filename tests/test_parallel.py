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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_train_step_matches_single_device():
    """Data-parallel loss == single-device loss for identical rng/data."""
    from npe_pfn_tpu.parallel import make_sharded_train_step
    from npe_pfn_tpu.pretrain import prior, train

    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    tcfg = train.TrainConfig(num_datasets=8, warmup_steps=2, max_steps=10)
    pcfg = prior.PriorConfig(
        num_features=8, num_ctx=32, num_qry=16, max_active_features=6, hidden=16
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    opt = train.make_optimizer(tcfg)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    params_a, params_b = copy(model.params), copy(model.params)

    # Single device reference (train_step donates its inputs).
    p1, o1, loss1, _ = train.train_step(
        cfg, tcfg, pcfg, params_a, opt.init(copy(model.params)), model.borders,
        jax.random.PRNGKey(1),
    )

    mesh = get_mesh(8)
    step, place = make_sharded_train_step(mesh, cfg, tcfg, pcfg)
    params, opt_state2 = place(params_b, opt.init(copy(model.params)))
    p2, o2, loss2 = step(params, opt_state2, model.borders, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
