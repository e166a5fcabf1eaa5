"""Generic accept_reject_sample driver + embedding nets + quantiles."""

import jax
import jax.numpy as jnp
import numpy as np

import npe_pfn_tpu as npt
from npe_pfn_tpu.models import TabICAConfig, TabICAModel, regressor


def test_accept_reject_basic():
    """Truncated-normal sampling via the generic driver."""

    def proposal(rng, n):
        s = jax.random.normal(rng, (n, 1))
        return s, {"lp": -0.5 * s[:, 0] ** 2}

    samples, aux, acc = npt.accept_reject_sample(
        jax.random.PRNGKey(0), proposal, lambda s: s[:, 0] > 0.0, 500
    )
    assert samples.shape == (500, 1)
    assert np.all(np.asarray(samples) > 0)
    assert aux["lp"].shape == (500,)
    assert 0.3 < acc < 0.7  # ~half of a standard normal is positive


def test_accept_reject_escape_hatch():
    """Impossible acceptance -> filled with unfiltered batch, acc ~ 0
    (reference accept_reject_sampler.py:74-77 semantics)."""

    def proposal(rng, n):
        return jax.random.normal(rng, (n, 1)), None

    samples, _, acc = npt.accept_reject_sample(
        jax.random.PRNGKey(1), proposal, lambda s: s[:, 0] > 1e9, 100, max_iters=3
    )
    assert samples.shape == (100, 1)
    assert acc == 0.0


def test_random_projection_embedding_with_estimator():
    """High-dim x flows through RandomProjectionEmbedding into sampling."""
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    theta = jax.random.normal(k1, (200, 2))
    x_hi = jnp.tile(theta, (1, 100)) + 0.1 * jax.random.normal(k2, (200, 200))
    emb = npt.embeddings.RandomProjectionEmbedding(200, 4, seed=0)
    est = npt.NPEPFN(
        model=model, embedding_net=emb, filter_context_size=64, qry_chunk=32
    )
    est.append_simulations(theta, x_hi)
    s = est.sample(16, x_hi[0], rng=jax.random.PRNGKey(2))
    assert s.shape == (16, 2)
    assert np.all(np.isfinite(np.asarray(s)))


def test_predict_quantiles_monotone():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (50, 8))
    y = x[:, 0] * 2.0
    fitted = regressor.fit_encode(model, x, y)
    logits = regressor.predict_logits(model, fitted, x[:5])
    qs = regressor.predict_quantiles(model, fitted, logits, jnp.array([0.1, 0.5, 0.9]))
    assert qs.shape == (5, 3)
    q = np.asarray(qs)
    assert np.all(q[:, 0] <= q[:, 1]) and np.all(q[:, 1] <= q[:, 2])


def test_conv1d_embedding_shapes():
    emb = npt.embeddings.Conv1DEmbedding(length=1024, dout=6, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(5), (10, 1024))
    out = emb(x)
    assert out.shape == (10, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_image_task_with_embedding_end_to_end():
    """gaussian_bump_image (1024-D x) through RandomProjection into sampling
    (the reference's light_tunnel pattern, evaluate_ropefm_batched.py:61-111)."""
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=32,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    task = npt.tasks.get_task("gaussian_bump_image")
    theta, x = task.simulate(jax.random.PRNGKey(1), 128)
    emb = npt.embeddings.RandomProjectionEmbedding(task.dim_x, 5, seed=1)
    est = npt.NPEPFN(
        prior=task.prior, model=model, embedding_net=emb,
        filter_context_size=64, qry_chunk=32,
    )
    est.append_simulations(theta, x)
    s = est.sample(8, x[0], rng=jax.random.PRNGKey(2))
    assert s.shape == (8, 3)


def test_accept_reject_small_batch_fill():
    """batch_size < num_samples with zero acceptance still returns the full
    count (tiled escape hatch)."""

    def proposal(rng, n):
        return jax.random.normal(rng, (n, 2)), jnp.zeros((n,))

    samples, aux, acc = npt.accept_reject_sample(
        jax.random.PRNGKey(0), proposal, lambda s: s[:, 0] > 1e9, 100,
        batch_size=16, max_iters=2,
    )
    assert samples.shape == (100, 2)
    assert aux.shape == (100,)
    assert acc == 0.0
