"""Row-attention bottleneck (TabICAConfig.row_pool_slots): the pooled path
must preserve every structural invariant of the dense path — encode/decode
identity, query independence, masking correctness — while shrinking the
row-attention axis from T tokens to K slots (the measured HBM lever,
results/train_step_ab.json)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, transformer

CFG = TabICAConfig(
    d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
    dtype="float32", row_pool_slots=3,
)


@pytest.fixture(scope="module")
def model():
    return TabICAModel.create(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def data():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x_ctx = jax.random.normal(ks[0], (20, 8))
    y_ctx = jax.random.normal(ks[1], (20,))
    x_qry = jax.random.normal(ks[2], (7, 8))
    return x_ctx, y_ctx, x_qry


@pytest.mark.fast
def test_pool_params_present(model):
    blocks = model.params["blocks"]
    assert "pool" in blocks
    assert blocks["pool"]["slots"].shape == (2, 3, 32)
    # the dense config must NOT carry pool params
    dense = TabICAModel.create(
        jax.random.PRNGKey(0), dataclasses.replace(CFG, row_pool_slots=0)
    )
    assert "pool" not in dense.params["blocks"]


@pytest.mark.fast
def test_forward_shape_and_finite(model, data):
    x_ctx, y_ctx, x_qry = data
    logits = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    assert logits.shape == (7, 16)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.fast
def test_encode_decode_matches_joint(model, data):
    x_ctx, y_ctx, x_qry = data
    joint = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    cache = transformer.encode_context(CFG, model.params, x_ctx, y_ctx)
    # pooled cache: slot axis K replaces the token axis T
    assert cache[0].shape[-3] == 20 and cache[0].shape[-4] == 3
    split = transformer.decode_queries(CFG, model.params, cache, x_qry)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(split), rtol=2e-4, atol=2e-5)


@pytest.mark.fast
def test_query_rows_independent(model, data):
    x_ctx, y_ctx, x_qry = data
    full = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    solo = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry[3:4])
    np.testing.assert_allclose(np.asarray(full[3]), np.asarray(solo[0]), rtol=2e-4, atol=2e-5)


@pytest.mark.fast
def test_feature_mask_excludes_columns(model, data):
    """Padded feature tokens must be masked out of the pooling keys too."""
    x_ctx, y_ctx, x_qry = data
    mask = jnp.array([True] * 5 + [False] * 3)
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry, feat_mask=mask)
    x_ctx2 = x_ctx.at[:, 5:].set(99.0)
    x_qry2 = x_qry.at[:, 5:].set(-99.0)
    b = transformer.forward(CFG, model.params, x_ctx2, y_ctx, x_qry2, feat_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_ctx_mask_excludes_rows(model, data):
    x_ctx, y_ctx, x_qry = data
    mask = jnp.arange(20) < 12
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry, ctx_mask=mask)
    x_ctx2 = x_ctx.at[12:].set(55.0)
    y_ctx2 = y_ctx.at[12:].set(-55.0)
    b = transformer.forward(CFG, model.params, x_ctx2, y_ctx2, x_qry, ctx_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    c = transformer.forward(CFG, model.params, x_ctx[:12], y_ctx[:12], x_qry)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5)


def test_gradients_flow_through_pool(model, data):
    """Training must reach the pool/unpool/slot params: finite loss, nonzero
    grads on every pool leaf (remat path, as pretraining uses)."""
    x_ctx, y_ctx, x_qry = data
    y_tgt = jax.random.normal(jax.random.PRNGKey(9), (7,))

    def loss_fn(params):
        logits = transformer.forward(
            CFG, params, x_ctx, y_ctx, x_qry, remat=True
        )
        # simple surrogate: NLL of a soft one-hot over bars
        tgt = jax.nn.one_hot(
            jnp.clip((y_tgt + 3) / 6 * 16, 0, 15).astype(int), 16
        )
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * tgt, -1))

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    pool_leaves = jax.tree_util.tree_leaves(grads["blocks"]["pool"])
    assert pool_leaves
    for g in pool_leaves:
        assert np.all(np.isfinite(np.asarray(g)))
    assert any(float(jnp.abs(g).max()) > 0 for g in pool_leaves)


def test_checkpoint_roundtrip(model, data, tmp_path):
    from npe_pfn_tpu.models import checkpoint

    x_ctx, y_ctx, x_qry = data
    path = str(tmp_path / "m.npz")
    checkpoint.save(path, model)
    loaded = checkpoint.load(path)
    assert loaded.cfg.row_pool_slots == 3
    a = transformer.forward(CFG, model.params, x_ctx, y_ctx, x_qry)
    b = transformer.forward(loaded.cfg, loaded.params, x_ctx, y_ctx, x_qry)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.fast
def test_dense_path_unchanged_by_feature():
    """row_pool_slots=0 must produce bit-identical params and logits to the
    pre-feature code path (shipped checkpoints depend on it)."""
    cfg = dataclasses.replace(CFG, row_pool_slots=0)
    m = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x_ctx = jax.random.normal(ks[0], (10, 8))
    y_ctx = jax.random.normal(ks[1], (10,))
    x_qry = jax.random.normal(ks[2], (4, 8))
    logits = transformer.forward(cfg, m.params, x_ctx, y_ctx, x_qry)
    assert logits.shape == (4, 16)
    assert np.all(np.isfinite(np.asarray(logits)))
