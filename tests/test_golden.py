"""Golden numerical snapshots of the transformer + bar distribution.

The reference's plan for numerical safety is golden parity vs the PyTorch
TabPFN (SURVEY §4); no torch TabPFN exists in this environment, so these
snapshots freeze OUR model's numerics instead — any refactor of the forward
pass (attention layout, normalization, dtype policy) that changes outputs
beyond float tolerance fails here deliberately.

Regenerate (only for *intentional* numerics changes):
    values printed by the snippet in this file's git history / scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npe_pfn_tpu.models import TabICAConfig, TabICAModel, transformer
from npe_pfn_tpu.models import bar_distribution as bar

GOLDEN_LOGITS_ROW0 = np.array(
    [
        0.011302, -0.011929, 0.005883, -0.014465, -0.000987, 0.025758,
        0.004771, 0.000805, -0.007748, 0.007296, -0.003956, 0.007798,
        -0.030584, 0.000109, 0.006654, -0.000894,
    ]
)
GOLDEN_BAR_LP = np.array([-0.930803, -1.808001, -4.066497])


@pytest.mark.fast
def test_transformer_golden():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(42), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x_ctx = jax.random.normal(ks[0], (12, 8))
    y_ctx = jax.random.normal(ks[1], (12,))
    x_qry = jax.random.normal(ks[2], (3, 8))
    logits = transformer.forward(cfg, model.params, x_ctx, y_ctx, x_qry)
    np.testing.assert_allclose(
        np.asarray(logits[0]), GOLDEN_LOGITS_ROW0, rtol=1e-3, atol=2e-5
    )


@pytest.mark.fast
def test_bar_distribution_golden():
    cfg = TabICAConfig(
        d_model=32, num_heads=2, num_layers=2, max_features=8, num_bars=16,
        dtype="float32",
    )
    model = TabICAModel.create(jax.random.PRNGKey(42), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x_ctx = jax.random.normal(ks[0], (12, 8))
    y_ctx = jax.random.normal(ks[1], (12,))
    x_qry = jax.random.normal(ks[2], (3, 8))
    logits = transformer.forward(cfg, model.params, x_ctx, y_ctx, x_qry)
    borders = bar.make_borders(16, 4.0)
    lp = bar.log_prob(borders, logits[0], jnp.array([0.0, 1.5, -3.0]))
    np.testing.assert_allclose(np.asarray(lp), GOLDEN_BAR_LP, rtol=1e-3, atol=2e-5)
