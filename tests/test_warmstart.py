"""Warm-start head upsampling: 256→1024 bars must preserve the density."""

import jax
import jax.numpy as jnp

from npe_pfn_tpu.models import bar_distribution as bar
from npe_pfn_tpu.models.config import TabICAConfig
from npe_pfn_tpu.models.regressor import TabICAModel
from npe_pfn_tpu.models import regressor
from npe_pfn_tpu.pretrain.warmstart import upsample_head


def test_upsampled_head_density_matches_interior():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=6, num_bars=64,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    r = 4
    cfg2 = TabICAConfig(**{**cfg.__dict__, "num_bars": cfg.num_bars * r})
    params2 = upsample_head(model.params, cfg.num_bars, cfg2.num_bars, cfg.bar_range)
    model2 = TabICAModel(
        cfg=cfg2, params=params2,
        borders=bar.make_borders(cfg2.num_bars, cfg2.bar_range),
    )

    # Coarse borders must nest exactly inside the fine ones.
    assert jnp.allclose(model.borders, model2.borders[::r], atol=1e-6)

    x = jax.random.normal(jax.random.PRNGKey(1), (40, 6))
    y = x[:, 0] + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (40,))
    fitted1 = regressor.fit_encode(model, x, y)
    fitted2 = regressor.fit_encode(model2, x, y)
    xq = jax.random.normal(jax.random.PRNGKey(3), (8, 6))
    logits1 = regressor.predict_logits(model, fitted1, xq)
    logits2 = regressor.predict_logits(model2, fitted2, xq)

    # Interior evaluation points: with 64 coarse bars over equal-normal-mass
    # borders the interior spans ±ndtri(1 - 1/64) ≈ ±2.15; the tail buckets
    # beyond legitimately differ (the fine tail half-normal is narrower).
    ygrid = jnp.linspace(-2.0, 2.0, 101)
    lp1 = bar.log_prob(model.borders, logits1[:, None, :], ygrid[None, :])
    lp2 = bar.log_prob(model2.borders, logits2[:, None, :], ygrid[None, :])
    assert jnp.max(jnp.abs(lp1 - lp2)) < 1e-4, float(jnp.max(jnp.abs(lp1 - lp2)))

    # Total interior mass within each coarse bucket is preserved too.
    p1 = jax.nn.softmax(logits1, axis=-1)
    p2 = jax.nn.softmax(logits2, axis=-1).reshape(logits1.shape[0], -1, r).sum(-1)
    assert jnp.max(jnp.abs(p1 - p2)) < 1e-5


def test_partitioned_lr_optimizer():
    """lr_trunk: head updates are much larger than trunk updates, so a
    warm-restarted run refines the upsampled bar head without destroying the
    converged trunk (round-2 regression; see TrainConfig.lr_trunk)."""
    import numpy as np
    from npe_pfn_tpu.models.config import TabICAConfig
    from npe_pfn_tpu.models.regressor import TabICAModel
    from npe_pfn_tpu.pretrain import prior, train

    cfg = TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=8,
                       num_bars=32, dtype="float32")
    tcfg = train.TrainConfig(num_datasets=2, warmup_steps=2, max_steps=10,
                             lr=1e-3, lr_trunk=1e-5)
    pcfg = prior.PriorConfig(num_features=8, num_ctx=32, num_qry=16,
                             max_active_features=6, hidden=16)
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    opt = train.make_optimizer(tcfg)
    opt_state = opt.init(model.params)
    params = model.params

    def flat(tree):
        return np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(tree)])

    p0 = {k: flat(v) for k, v in params.items()}
    for i in range(3):
        params, opt_state, loss, _ = train.train_step(
            cfg, tcfg, pcfg, params, opt_state, model.borders, jax.random.PRNGKey(i)
        )
    assert np.isfinite(float(loss))
    d_head = np.abs(flat(params["head"]) - p0["head"]).mean()
    d_trunk = np.abs(flat(params["blocks"]) - p0["blocks"]).mean()
    assert d_head > 10 * d_trunk, (d_head, d_trunk)


def test_feature_curriculum():
    """Traced max_feat override caps the active-feature count (up to the
    inverse family's theta-dim floor) and is accepted by train_step without
    changing the no-curriculum default path."""
    import numpy as np
    from npe_pfn_tpu.models.config import TabICAConfig
    from npe_pfn_tpu.models.regressor import TabICAModel
    from npe_pfn_tpu.pretrain import prior, train

    pcfg = prior.PriorConfig(num_features=16, num_ctx=32, num_qry=16,
                             max_active_features=14, hidden=16, max_theta_dim=4)
    b_lo = prior.sample_tasks(jax.random.PRNGKey(0), 64, pcfg,
                              jnp.asarray(2, jnp.int32))
    b_hi = prior.sample_tasks(jax.random.PRNGKey(0), 64, pcfg,
                              jnp.asarray(14, jnp.int32))
    b_def = prior.sample_tasks(jax.random.PRNGKey(0), 64, pcfg)
    n_lo = np.asarray(b_lo.feat_mask.sum(-1))
    n_hi = np.asarray(b_hi.feat_mask.sum(-1))
    # Inverse-family tasks may use up to max(max_feat, max_theta_dim) columns.
    assert n_lo.max() <= max(2, pcfg.max_theta_dim + 1)
    assert n_lo.mean() < n_hi.mean() - 1.0
    # max_feat == cfg default reproduces the default path exactly.
    assert np.array_equal(n_hi, np.asarray(b_def.feat_mask.sum(-1)))

    cfg = TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=16,
                       num_bars=32, dtype="float32")
    tcfg = train.TrainConfig(num_datasets=2, warmup_steps=2, max_steps=10,
                             feat_curriculum_steps=100, feat_curriculum_init=4)
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    opt = train.make_optimizer(tcfg)
    params, opt_state, loss, _ = train.train_step(
        cfg, tcfg, pcfg, model.params, opt.init(model.params), model.borders,
        jax.random.PRNGKey(1), jnp.asarray(4, jnp.int32),
    )
    assert np.isfinite(float(loss))
