"""Mixture-of-experts MLP + expert-parallel placement.

The MoE option (models/config.py num_experts) is this framework's capacity
lever beyond the reference's fixed dense TabPFN (the reference has neither
MoE nor any parallelism — SURVEY §2.5). Tests cover: routing/gating
semantics, the dense-MLP identity (tied experts), the Switch-style
load-balance aux loss at its analytic anchors, gradient flow through the
router, the pretraining loss path, and exact equality of the
expert-parallel placement (parallel/expert_parallel.py) on "ep" and
"tp"x"ep" meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor
from npe_pfn_tpu.models import transformer as T
from npe_pfn_tpu.parallel import ep_place, ep_pspecs


def _cfg(**kw):
    base = dict(
        d_model=32, num_heads=4, num_layers=2, max_features=4,
        num_bars=16, dtype="float32", num_experts=4, moe_top_k=2,
    )
    base.update(kw)
    return TabICAConfig(**base)


def _model(key=0, **kw):
    return TabICAModel.create(jax.random.PRNGKey(key), _cfg(**kw))


def _data(n=64, f=4, q=8, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(k1, (n, f))
    y = x[:, 0] + 0.1 * jax.random.normal(k2, (n,))
    return x, y, jax.random.normal(k3, (q, f))


def test_moe_params_and_forward_shapes():
    m = _model()
    mlp = m.params["blocks"]["mlp"]
    assert sorted(mlp.keys()) == ["b1", "b2", "router", "w1", "w2"]
    assert mlp["w1"].shape == (2, 4, 32, 128)
    x, y, xq = _data()
    fitted = regressor.fit_encode(m, x, y)
    logits = regressor.predict_logits(m, fitted, xq)
    assert logits.shape == (8, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_gates_topk_support_and_normalization():
    cfg = _cfg()
    p = {
        "router": jax.random.normal(jax.random.PRNGKey(0), (32, 4)),
        "w1": 0.02 * jax.random.normal(jax.random.PRNGKey(1), (4, 32, 128)),
        "b1": jnp.zeros((4, 128)),
        "w2": 0.02 * jax.random.normal(jax.random.PRNGKey(2), (4, 128, 32)),
        "b2": jnp.zeros((4, 32)),
    }
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 32))
    glog = x @ p["router"]
    kth = jax.lax.top_k(glog, cfg.moe_top_k)[0][..., -1:]
    gates = jax.nn.softmax(jnp.where(glog >= kth, glog, -1e9), axis=-1)
    np.testing.assert_allclose(np.sum(np.asarray(gates), -1), 1.0, rtol=1e-5)
    # exactly top_k experts carry weight per token (continuous inputs: no ties)
    assert int(jnp.max(jnp.sum(gates > 1e-6, axis=-1))) == cfg.moe_top_k
    out, _ = T._moe_mlp(cfg, p, x)
    assert out.shape == (16, 32)


def test_tied_experts_equal_dense_mlp():
    """If every expert holds the SAME weights, gating is irrelevant and the
    MoE output must equal the plain dense MLP with those weights."""
    cfg = _cfg()
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    w1 = 0.05 * jax.random.normal(k[0], (32, 128))
    w2 = 0.05 * jax.random.normal(k[1], (128, 32))
    dense = {"w1": w1, "b1": jnp.ones((128,)) * 0.1, "w2": w2,
             "b2": jnp.ones((32,)) * 0.2}
    tile = lambda a: jnp.broadcast_to(a, (4,) + a.shape)
    moe = {"router": jax.random.normal(k[2], (32, 4)),
           "w1": tile(w1), "b1": tile(dense["b1"]),
           "w2": tile(w2), "b2": tile(dense["b2"])}
    x = jax.random.normal(jax.random.PRNGKey(9), (24, 32))
    out_moe, _ = T._moe_mlp(cfg, moe, x)
    out_dense = T._mlp(cfg, dense, x)
    np.testing.assert_allclose(
        np.asarray(out_moe), np.asarray(out_dense), rtol=1e-5, atol=1e-5
    )


def test_aux_loss_anchors():
    """Uniform routing -> aux = 1; fully collapsed routing -> aux = E/k·(~1)."""
    cfg = _cfg()
    mk = lambda router: {
        "router": router,
        "w1": jnp.zeros((4, 32, 128)), "b1": jnp.zeros((4, 128)),
        "w2": jnp.zeros((4, 128, 32)), "b2": jnp.zeros((4, 32)),
    }
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 32))
    # Near-uniform: a tiny random router breaks top-k ties while keeping
    # probabilities ~1/E -> aux ~ 1.
    _, aux_u = T._moe_mlp(cfg, mk(1e-4 * jax.random.normal(
        jax.random.PRNGKey(1), (32, 4))), x)
    assert abs(float(aux_u) - 1.0) < 0.05
    # Collapse: all-positive inputs with a rank-1 router whose column scales
    # are 40 > 20 >> -40 give every token top-2 = {0, 1} and P_0 ~ 1:
    # aux = E * (f_0/k · P_0) = 4 · 0.5 = E/k = 2.
    x_pos = jnp.abs(x)
    router = jnp.outer(jnp.ones((32,)), jnp.array([40.0, 20.0, -40.0, -40.0]))
    _, aux_c = T._moe_mlp(cfg, mk(router), x_pos)
    assert abs(float(aux_c) - cfg.num_experts / cfg.moe_top_k) < 0.05


def test_forward_with_aux_and_router_grads():
    m = _model()
    x, y, xq = _data()
    logits, aux = T.forward(m.cfg, m.params, x, y, xq, None, None, False, True)
    assert logits.shape == (8, 16)
    assert 0.9 < float(aux) < float(m.cfg.num_experts)

    g = jax.grad(
        lambda p: T.forward(m.cfg, p, x, y, xq, None, None, False, True)[1]
    )(m.params)
    rg = float(jnp.linalg.norm(g["blocks"]["mlp"]["router"]))
    assert np.isfinite(rg) and rg > 0.0
    # dense model returns aux exactly 0 through the same code path
    md = TabICAModel.create(jax.random.PRNGKey(0), _cfg(num_experts=0))
    _, aux0 = T.forward(md.cfg, md.params, x, y, xq, None, None, False, True)
    assert float(aux0) == 0.0


def test_batch_loss_moe_path():
    from npe_pfn_tpu.pretrain import prior, train

    cfg = _cfg(max_features=8)
    m = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    pcfg = prior.PriorConfig(
        num_features=8, max_active_features=6, num_ctx=32, num_qry=8, hidden=16
    )
    batch = prior.sample_tasks(jax.random.PRNGKey(1), 4, pcfg)
    loss = train.batch_loss(cfg, m.borders, m.params, batch, remat=False)
    assert np.isfinite(float(loss))
    # aux weight moves the loss (router is random -> aux > 0)
    loss0 = train.batch_loss(
        cfg, m.borders, m.params, batch, remat=False, moe_aux_weight=0.0
    )
    assert float(loss) != float(loss0)


def test_train_step_moe():
    """One optimizer step on a tiny MoE config: loss finite, router updated."""
    from npe_pfn_tpu.pretrain import prior, train

    cfg = _cfg(max_features=8, num_layers=1)
    m = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    tcfg = train.TrainConfig(num_datasets=2, warmup_steps=1, max_steps=4)
    pcfg = prior.PriorConfig(
        num_features=8, max_active_features=6, num_ctx=32, num_qry=8, hidden=16
    )
    opt_state = train.make_optimizer(tcfg).init(m.params)
    params, opt_state, loss, gnorm = train.train_step(
        cfg, tcfg, pcfg, m.params, opt_state, m.borders, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    moved = float(jnp.linalg.norm(
        params["blocks"]["mlp"]["router"]
    ))
    assert moved > 0.0


def test_ep_pspecs_structure():
    m = _model()
    specs = ep_pspecs(m.params)
    mlp = specs["blocks"]["mlp"]
    assert mlp["router"] == P()
    assert mlp["w1"] == P(None, "ep", None, None)
    assert mlp["b2"] == P(None, "ep", None)
    assert specs["blocks"]["row_attn"]["wq"] == P()
    merged = ep_pspecs(m.params, tp_axis="tp")
    assert merged["blocks"]["row_attn"]["wq"] == P(None, None, "tp", None)
    assert merged["blocks"]["mlp"]["w1"] == P(None, "ep", None, None)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_ep_place_exact_match():
    m = _model()
    x, y, xq = _data()
    ref = regressor.predict_logits(m, regressor.fit_encode(m, x, y), xq)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    placed = ep_place(mesh, m)
    out = regressor.predict_logits(placed, regressor.fit_encode(placed, x, y), xq)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_ep_compose_exact_match():
    m = _model()
    x, y, xq = _data()
    ref = regressor.predict_logits(m, regressor.fit_encode(m, x, y), xq)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("tp", "ep"))
    placed = ep_place(mesh, m, tp_axis="tp")
    out = regressor.predict_logits(placed, regressor.fit_encode(placed, x, y), xq)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_ep_place_validation():
    md = TabICAModel.create(jax.random.PRNGKey(0), _cfg(num_experts=0))
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    with pytest.raises(ValueError):
        ep_place(mesh, md)
    m3 = TabICAModel.create(jax.random.PRNGKey(0), _cfg(num_experts=6))
    with pytest.raises(ValueError):
        ep_place(mesh, m3)


def test_config_and_tp_place_validation():
    # moe_top_k must fit within num_experts — caught at config construction,
    # not as an opaque trace-time top_k error.
    with pytest.raises(ValueError):
        _cfg(num_experts=1, moe_top_k=2)
    # tp_place on a MoE model would silently replicate the expert weights;
    # it must refuse and point at ep_place(tp_axis=...).
    from npe_pfn_tpu.parallel import tp_place

    m = _model()
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    with pytest.raises(ValueError, match="ep_place"):
        tp_place(mesh, m)


def test_eval_step_excludes_moe_aux():
    """Validation must be pure NLL: same params, aux weight has no effect."""
    from npe_pfn_tpu.pretrain import prior, train

    cfg = _cfg(max_features=8, num_layers=1)
    m = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    pcfg = prior.PriorConfig(
        num_features=8, max_active_features=6, num_ctx=32, num_qry=8, hidden=16
    )
    val = train.eval_step(cfg, m.params, pcfg, m.borders, jax.random.PRNGKey(2),
                          num_batches=1)
    batch = prior.sample_tasks(jax.random.fold_in(jax.random.PRNGKey(2), 0),
                               32, pcfg)
    pure = train.batch_loss(cfg, m.borders, m.params, batch, remat=False,
                            moe_aux_weight=0.0)
    np.testing.assert_allclose(float(val), float(pure), rtol=1e-5)


def test_moe_checkpoint_roundtrip(tmp_path):
    from npe_pfn_tpu.models import checkpoint

    m = _model()
    path = str(tmp_path / "moe.npz")
    checkpoint.save(path, m)
    m2 = checkpoint.load(path)
    assert m2.cfg.num_experts == 4 and m2.cfg.moe_top_k == 2
    x, y, xq = _data()
    a = regressor.predict_logits(m, regressor.fit_encode(m, x, y), xq)
    b = regressor.predict_logits(m2, regressor.fit_encode(m2, x, y), xq)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
