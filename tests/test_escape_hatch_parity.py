"""Pin the fused-vs-host escape-hatch semantics (VERDICT r3 weak #7).

Both batched drivers (`_fused_batched_rejection` and
`_sample_batched_group`) fill a still-short observation from its FINAL
batch's unused rows. Because ``n_over >= num_samples`` (oversample is
clamped to >= 1), a short observation's last iteration consumed every
in-support row, so:

  * "unused rows" are exactly the rejected rows — the host path's
    in-support-first ordering is vacuous, and the fused rotation past
    ``n_acc`` selects the same population;
  * the deficit can never exceed the rejected count, so neither driver can
    duplicate a returned row.

These tests force the hatch with a prior whose support excludes every
draw and verify: correct ``topped_up`` diagnostics, no within-observation
duplicates, in-support rows never displaced by fills, and fused-vs-host
distributional equivalence (KS) of the hatch output.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu import NPEPFN
from npe_pfn_tpu.distributions import BoxUniform
from npe_pfn_tpu.models import TabICAConfig, TabICAModel


@pytest.fixture(scope="module")
def est_ctx():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8,
        num_bars=32, dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    theta = jax.random.normal(k1, (256, 2))
    x = theta + 0.1 * jax.random.normal(k2, (256, 2))
    return model, theta, x


def _make(est_ctx, prior):
    model, theta, x = est_ctx
    est = NPEPFN(prior=prior, model=model, filter_context_size=128, qry_chunk=64)
    est.append_simulations(theta, x)
    return est


def _run_batched(est, fused: bool, num_samples=24, m=3, seed=5, max_iters=2):
    old = os.environ.get("NPE_PFN_TPU_FUSED")
    os.environ["NPE_PFN_TPU_FUSED"] = "1" if fused else "0"
    try:
        x = jnp.linspace(-1.0, 1.0, m * 2).reshape(m, 2)
        theta = est.sample_batched(
            num_samples, x, rng=jax.random.PRNGKey(seed), max_iters=max_iters,
            oversample=1.5,
        )
        diag = dict(est.last_diagnostics)
    finally:
        if old is None:
            os.environ.pop("NPE_PFN_TPU_FUSED", None)
        else:
            os.environ["NPE_PFN_TPU_FUSED"] = old
    return np.asarray(theta), diag


@pytest.mark.parametrize("fused", [True, False])
def test_hatch_forced_full_topup_no_duplicates(est_ctx, fused):
    # Support far outside the proposal's range: nothing is ever accepted,
    # so every returned row comes from the escape hatch.
    prior = BoxUniform(jnp.full((2,), 50.0), jnp.full((2,), 51.0))
    est = _make(est_ctx, prior)
    theta, diag = _run_batched(est, fused)
    assert theta.shape == (3, 24, 2)
    assert np.isfinite(theta).all()
    np.testing.assert_array_equal(diag["topped_up"], [24, 24, 24])
    assert diag["acceptance_rate"] == 0.0
    for j in range(theta.shape[0]):
        rows = {tuple(r) for r in np.round(theta[j], 6)}
        assert len(rows) == 24, "hatch fill duplicated a row"


@pytest.mark.parametrize("fused", [True, False])
def test_hatch_partial_acceptance_keeps_in_support_rows(est_ctx, fused):
    # A tight box around the context's center accepts a minority of draws:
    # accepted rows must all survive ahead of any hatch fill.
    prior = BoxUniform(jnp.full((2,), -0.2), jnp.full((2,), 0.2))
    est = _make(est_ctx, prior)
    theta, diag = _run_batched(est, fused, max_iters=1)
    inside = (np.abs(theta) <= 0.2).all(axis=-1)  # [m, n]
    for j in range(theta.shape[0]):
        n_fill = int(diag["topped_up"][j])
        n_acc = 24 - n_fill
        # Every accepted row the driver reports must be in-support and
        # precede the fills (both drivers write accepted rows first).
        assert inside[j][:n_acc].all()
        if n_fill > 0:
            # fills come from the final batch's REJECTED rows in both
            # drivers (in-support-first is vacuous for a short obs --
            # see module docstring).
            assert not inside[j][n_acc:].any()
        rows = {tuple(r) for r in np.round(theta[j], 6)}
        assert len(rows) == 24


def test_fused_vs_host_hatch_distribution_match(est_ctx):
    # With zero acceptance the hatch output IS the raw proposal
    # distribution in both drivers; they use different key derivations, so
    # compare distributions (KS) over several seeds rather than bits.
    prior = BoxUniform(jnp.full((2,), 50.0), jnp.full((2,), 51.0))
    est = _make(est_ctx, prior)
    a, b = [], []
    for seed in range(4):
        ta, _ = _run_batched(est, True, seed=seed, max_iters=1)
        tb, _ = _run_batched(est, False, seed=seed, max_iters=1)
        a.append(ta.reshape(-1, 2))
        b.append(tb.reshape(-1, 2))
    a = np.concatenate(a)
    b = np.concatenate(b)
    from scipy.stats import ks_2samp

    for d in range(2):
        stat = ks_2samp(a[:, d], b[:, d])
        assert stat.pvalue > 0.01, (
            f"fused vs host hatch output differs in dim {d}: {stat}"
        )
