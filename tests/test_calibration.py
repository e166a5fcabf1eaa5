"""Classifier calibration: the ratio log_prob and restricted prior presume
calibrated predict_proba (reference npe_pfn.py:683-704,
restricted_prior.py:24-27); bound the ECE of the shipped checkpoint and the
contract of the multi-class head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.eval import calibration as C
from npe_pfn_tpu.models import checkpoint, regressor


@pytest.fixture(scope="module")
def model():
    m, trained = checkpoint.load_default()
    if not trained:
        pytest.skip("no shipped checkpoint")
    return m


def test_ece_and_curve_math():
    p = np.array([0.1] * 50 + [0.9] * 50)
    y = np.array([0.0] * 45 + [1.0] * 5 + [1.0] * 45 + [0.0] * 5)
    assert C.ece(p, y, bins=10) == pytest.approx(0.0, abs=0.021)
    y_bad = np.concatenate([y[50:], y[:50]])
    assert C.ece(p, y_bad, bins=10) > 0.5


def test_binary_classifier_calibrated(model):
    r = C.audit_binary(model, jax.random.PRNGKey(0), num_tasks=3, n_ctx=256, n_qry=256)
    assert r["ece"] < 0.15, r["ece"]
    assert r["mean_abs_prob_error"] < 0.18, r["mean_abs_prob_error"]


def test_multiclass_proba_contract(model):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (200, 4))
    w = jax.random.normal(k2, (4, 3)) * 1.5
    labels = jax.random.categorical(k3, x @ w, axis=-1)
    probs = regressor.predict_proba_multiclass(model, x[:160], labels[:160], x[160:], 3)
    assert probs.shape == (40, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # Separable-ish task: predictions beat chance comfortably.
    acc = float((jnp.argmax(probs, -1) == labels[160:]).mean())
    assert acc > 0.55, acc
