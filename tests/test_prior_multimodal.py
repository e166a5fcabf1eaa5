"""Round-4 conditional-shape prior enrichment (pretrain/prior.py family C +
the sign-fold variant of family B).

The diagnosis behind these knobs: the benchmark posteriors the pretrained
model fails (two_moons, gaussian_mixture, SLCP) are thin separated
location-mixtures or spike+slab scale-mixtures, and families A/B rarely emit
those conditional shapes (results/diagnosis_prior_audit.json). These tests
pin (1) backward compatibility — knobs at 0 reproduce the v4 stream
byte-for-byte, (2) that family C actually produces separated multimodal and
scale-mixture conditionals, (3) static shapes / finiteness under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.pretrain import prior


def _cfg(**kw):
    base = dict(num_features=16, num_ctx=96, num_qry=32, max_active_features=8)
    base.update(kw)
    return prior.PriorConfig(**base)


def test_knobs_off_reproduce_v4_stream():
    """p_multimodal=0, p_sym_fold=0 must not perturb any existing key
    stream: a resume of a v4-recipe run sees identical data."""
    cfg_old = _cfg(p_heteroscedastic=0.3, p_heavy_tail=0.2, p_categorical_feats=0.2)
    cfg_new = _cfg(
        p_heteroscedastic=0.3, p_heavy_tail=0.2, p_categorical_feats=0.2,
        p_multimodal=0.0, p_sym_fold=0.0, max_mixture_components=3,
    )
    a = prior.sample_tasks(jax.random.PRNGKey(3), 8, cfg_old)
    b = prior.sample_tasks(jax.random.PRNGKey(3), 8, cfg_new)
    for fa, fb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_enriched_batch_static_shapes_and_finite():
    cfg = _cfg(p_multimodal=0.35, p_sym_fold=0.5)
    batch = prior.sample_tasks(jax.random.PRNGKey(0), 16, cfg)
    assert batch.x_ctx.shape == (16, 96, 16)
    assert batch.y_ctx.shape == (16, 96)
    assert batch.x_qry.shape == (16, 32, 16)
    for leaf in jax.tree_util.tree_leaves(batch):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def _family_c_conditionals(seed, num_tasks, cfg):
    """Per-task exact conditional (mu_k, sig_k, w_k) at one query row, plus
    the marginal-sd of a y draw per row — the units the z-scored bar head
    sees at inference."""
    out = []
    for t in range(num_tasks):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), t)
        R = cfg.num_ctx + cfg.num_qry
        xin = jax.random.normal(jax.random.fold_in(key, 1), (R, cfg.num_features))
        y, (mu, sig, wlog) = prior._family_c(jax.random.fold_in(key, 2), cfg, xin)
        sd_marg = max(float(jnp.std(y)), 1e-9)
        row = cfg.num_ctx  # first query row
        w = np.asarray(jax.nn.softmax(wlog[row]))
        out.append(
            {
                "mu_z": np.asarray(mu[row]) / sd_marg,
                "sig_z": np.asarray(sig) / sd_marg,
                "w": w,
            }
        )
    return out


def test_family_c_produces_separated_thin_modes():
    """A visible fraction of family-C EXACT conditionals must be multimodal
    with thin, well-separated modes in marginal-sd units — the two_moons
    step-2 requirement (sep >~ 0.5z with component sd <~ 0.15z)."""
    cfg = _cfg(p_multimodal=1.0)
    conds = _family_c_conditionals(1, 64, cfg)
    n_sep_thin = 0
    for c in conds:
        live = c["w"] > 0.1
        if live.sum() < 2:
            continue
        mus, sigs = c["mu_z"][live], c["sig_z"][live]
        for i in range(len(mus)):
            for j in range(i + 1, len(mus)):
                gap = abs(mus[i] - mus[j])
                if gap > 3 * (sigs[i] + sigs[j]) and gap > 0.5 and min(sigs[i], sigs[j]) < 0.15:
                    break
            else:
                continue
            n_sep_thin += 1
            break
    assert n_sep_thin >= 15, f"only {n_sep_thin}/64 tasks have thin separated modes"


def test_family_c_emits_scale_mixtures():
    """Spike+slab conditionals (gaussian_mixture's posterior shape) must
    occur: two live components with sd ratio > 5 and mean gap below the
    broad component's sd."""
    cfg = _cfg(p_multimodal=1.0)
    conds = _family_c_conditionals(2, 64, cfg)
    n_sm = 0
    for c in conds:
        live = c["w"] > 0.1
        if live.sum() < 2:
            continue
        mus, sigs = c["mu_z"][live], c["sig_z"][live]
        for i in range(len(mus)):
            for j in range(len(mus)):
                if i != j and sigs[j] > 5 * sigs[i] and abs(mus[i] - mus[j]) < sigs[j]:
                    break
            else:
                continue
            n_sm += 1
            break
    assert n_sm >= 6, f"only {n_sm}/64 tasks look like scale mixtures"


def test_marginal_mixture_conditionals_are_x_independent():
    """With p_marginal_mixture=1 every family-C task must have row-constant
    means and weights (y ⊥ x) — the spike+slab density-estimation branch
    (VERDICT r4 item 3). Half of them must collapse to a shared mean."""
    cfg = _cfg(p_multimodal=1.0, p_marginal_mixture=1.0)
    n_collapsed = 0
    for t in range(32):
        key = jax.random.fold_in(jax.random.PRNGKey(11), t)
        R = cfg.num_ctx + cfg.num_qry
        xin = jax.random.normal(jax.random.fold_in(key, 1), (R, cfg.num_features))
        _, (mu, _, wlog) = prior._family_c(jax.random.fold_in(key, 2), cfg, xin)
        mu, wlog = np.asarray(mu), np.asarray(wlog)
        assert np.ptp(mu, axis=0).max() < 1e-6, "means vary across rows"
        finite = np.isfinite(wlog[0])
        assert np.ptp(wlog[:, finite], axis=0).max() < 1e-6, "weights vary across rows"
        if np.ptp(mu[0]) < 1e-6:
            n_collapsed += 1
    assert 6 <= n_collapsed <= 26, f"collapse share off: {n_collapsed}/32"


def test_marginal_mixture_off_reproduces_stream():
    """p_marginal_mixture=0 must not perturb the v5/v6 key stream."""
    a = prior.sample_tasks(jax.random.PRNGKey(7), 8, _cfg(p_multimodal=0.4, p_sym_fold=0.7))
    b = prior.sample_tasks(
        jax.random.PRNGKey(7), 8,
        _cfg(p_multimodal=0.4, p_sym_fold=0.7, p_marginal_mixture=0.0),
    )
    for fa, fb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_sym_fold_changes_inverse_tasks_only_when_enabled():
    """p_sym_fold must alter (some) inverse-family tasks but never family A
    outputs (the fold key rides ks[13], family B's simulator key)."""
    cfg_off = _cfg(p_inverse=1.0, p_sym_fold=0.0)
    cfg_on = _cfg(p_inverse=1.0, p_sym_fold=1.0)
    a = prior.sample_tasks(jax.random.PRNGKey(5), 16, cfg_off)
    b = prior.sample_tasks(jax.random.PRNGKey(5), 16, cfg_on)
    # same theta targets (y unchanged: y_inv = theta[:, j] with same keys)
    np.testing.assert_allclose(np.asarray(a.y_ctx), np.asarray(b.y_ctx), rtol=1e-6)
    # but simulator outputs differ for (almost) all tasks
    diff = np.abs(np.asarray(a.x_ctx) - np.asarray(b.x_ctx)).max(axis=(1, 2))
    assert (diff > 1e-6).mean() > 0.9


def test_sym_fold_posterior_is_sign_symmetric_bimodal():
    """Mechanism check with the fold undiluted: max_theta_dim=1 makes the
    folded simulator input |a*theta|, so x must track |theta| rather than
    theta — the sign-symmetric bimodal posterior signature. (With 6 mixed
    dims the per-column correlation proxy washes out; 1D isolates it.)"""
    cfg = _cfg(p_inverse=1.0, p_sym_fold=1.0, num_ctx=256, max_theta_dim=1)
    batch = prior.sample_tasks(jax.random.PRNGKey(8), 32, cfg)
    y = np.asarray(batch.y_ctx)
    x = np.asarray(batch.x_ctx)
    assert abs(np.mean(y)) < 0.1  # targets stay signed standard-normal-ish
    wins = 0
    for t in range(y.shape[0]):
        cy = np.abs([np.corrcoef(x[t][:, c], y[t])[0, 1] for c in range(x.shape[-1])])
        cabs = np.abs([np.corrcoef(x[t][:, c], np.abs(y[t]))[0, 1] for c in range(x.shape[-1])])
        cy, cabs = np.nan_to_num(cy), np.nan_to_num(cabs)
        if cabs.max() > cy.max() + 0.1:
            wins += 1
    assert wins >= 16, f"only {wins}/32 folded 1D tasks show |theta| structure"
