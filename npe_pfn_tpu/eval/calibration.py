"""Classifier calibration audit.

The restricted prior accepts θ when P(valid) > 0.3 (reference
restricted_prior.py:24-27) and the density-ratio log_prob converts class
probabilities straight into densities (reference npe_pfn.py:683-704) — both
presume the classifier's probabilities are CALIBRATED, not merely accurate.
The reference inherits whatever calibration TabPFN ships with and never
audits it; here the audit is part of the eval suite.

Ground truth comes from synthetic tasks with KNOWN P(y=1|x) (logistic and
random-MLP link functions), so the audit reports both the standard
label-based reliability curve / ECE and the sharper direct error
E|p̂ − p_true| that is only measurable when the true conditional is known.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import regressor
from ..models.regressor import TabICAModel


def reliability_curve(p_hat: np.ndarray, y: np.ndarray, bins: int = 15) -> Dict:
    """Equal-width reliability bins over predicted P(y=1)."""
    p_hat = np.asarray(p_hat, np.float64)
    y = np.asarray(y, np.float64)
    edges = np.linspace(0.0, 1.0, bins + 1)
    idx = np.clip(np.digitize(p_hat, edges[1:-1]), 0, bins - 1)
    conf, acc, frac = [], [], []
    for b in range(bins):
        m = idx == b
        if m.sum() == 0:
            conf.append(np.nan)
            acc.append(np.nan)
            frac.append(0.0)
        else:
            conf.append(float(p_hat[m].mean()))
            acc.append(float(y[m].mean()))
            frac.append(float(m.mean()))
    return {"confidence": conf, "empirical": acc, "fraction": frac, "edges": edges.tolist()}


def ece(p_hat: np.ndarray, y: np.ndarray, bins: int = 15) -> float:
    """Expected calibration error: bin-mass-weighted |confidence − accuracy|."""
    curve = reliability_curve(p_hat, y, bins)
    out = 0.0
    for c, a, f in zip(curve["confidence"], curve["empirical"], curve["fraction"]):
        if f > 0:
            out += f * abs(c - a)
    return float(out)


def _binary_task(rng, n_ctx: int, n_qry: int, dim: int, link: str):
    """One binary task with known P(y=1|x)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = jax.random.normal(k1, (n_ctx + n_qry, dim))
    if link == "logistic":
        w = jax.random.normal(k2, (dim,)) * (2.0 / jnp.sqrt(dim))
        b = 0.5 * jax.random.normal(k3, ())
        logit = x @ w + b
    else:  # random two-layer MLP link
        h = 16
        ka, kb = jax.random.split(k2)
        w1 = jax.random.normal(ka, (dim, h)) * (2.0 / jnp.sqrt(dim))
        w2 = jax.random.normal(kb, (h,)) / jnp.sqrt(h)
        logit = 2.0 * (jnp.tanh(x @ w1) @ w2)
    p_true = jax.nn.sigmoid(logit)
    y = jax.random.bernoulli(k4, p_true).astype(jnp.float32)
    return x[:n_ctx], y[:n_ctx], x[n_ctx:], y[n_ctx:], p_true[n_ctx:]


def audit_binary(
    model: TabICAModel,
    rng: jax.Array,
    num_tasks: int = 8,
    n_ctx: int = 256,
    n_qry: int = 256,
    dim: int = 5,
    link: str = "logistic",
    bins: int = 15,
) -> Dict:
    """Audit the posterior-mean binary classifier (regressor.predict_proba,
    the engine behind the ratio log_prob and the restricted prior)."""
    ps, ys, pts = [], [], []
    for t in range(num_tasks):
        kt = jax.random.fold_in(rng, t)
        x_ctx, y_ctx, x_qry, y_qry, p_true = _binary_task(kt, n_ctx, n_qry, dim, link)
        probs = regressor.predict_proba(model, x_ctx, y_ctx, x_qry)
        ps.append(np.asarray(probs[:, 1]))
        ys.append(np.asarray(y_qry))
        pts.append(np.asarray(p_true))
    p_hat = np.concatenate(ps)
    y = np.concatenate(ys)
    p_true = np.concatenate(pts)
    return {
        "link": link,
        "n": int(p_hat.size),
        "ece": ece(p_hat, y, bins),
        "mean_abs_prob_error": float(np.mean(np.abs(p_hat - p_true))),
        "brier": float(np.mean((p_hat - y) ** 2)),
        "brier_true_p": float(np.mean((p_true - y) ** 2)),  # irreducible floor
        "curve": reliability_curve(p_hat, y, bins),
    }


def audit_multiclass(
    model: TabICAModel,
    rng: jax.Array,
    num_tasks: int = 4,
    n_ctx: int = 256,
    n_qry: int = 256,
    dim: int = 5,
    num_classes: int = 3,
    bins: int = 15,
) -> Dict:
    """Audit predict_proba_multiclass: top-class ECE + accuracy on softmax-
    ground-truth tasks."""
    confs, hits, accs = [], [], []
    for t in range(num_tasks):
        kt = jax.random.fold_in(rng, t)
        k1, k2, k3 = jax.random.split(kt, 3)
        x = jax.random.normal(k1, (n_ctx + n_qry, dim))
        w = jax.random.normal(k2, (dim, num_classes)) * (2.0 / jnp.sqrt(dim))
        p_true = jax.nn.softmax(x @ w, axis=-1)
        labels = jax.random.categorical(k3, jnp.log(p_true), axis=-1)
        probs = regressor.predict_proba_multiclass(
            model, x[:n_ctx], labels[:n_ctx], x[n_ctx:], num_classes
        )
        pred = np.asarray(jnp.argmax(probs, axis=-1))
        conf = np.asarray(jnp.max(probs, axis=-1))
        true_q = np.asarray(labels[n_ctx:])
        confs.append(conf)
        hits.append((pred == true_q).astype(np.float64))
        accs.append(float((pred == true_q).mean()))
    conf = np.concatenate(confs)
    hit = np.concatenate(hits)
    return {
        "num_classes": num_classes,
        "n": int(conf.size),
        "accuracy": float(np.mean(accs)),
        "top_class_ece": ece(conf, hit, bins),
        "curve": reliability_curve(conf, hit, bins),
    }
