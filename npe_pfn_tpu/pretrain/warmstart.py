"""Warm-starting a finer-bar-head model from a coarser checkpoint.

The v1→v2 quality recipe raises the bar-distribution resolution (256→1024
bars) because fine-structure posteriors (e.g. the two-moons crescent, width
~0.01 in prior units) fall below the coarse bin width. Retraining from
scratch would waste the 131k-step v1 trunk; instead the trunk is copied
verbatim and only the final head projection is *upsampled*.

Exactness: ``bar_distribution.make_borders`` places borders at equal-normal-
mass quantiles via ``linspace(lo, hi, B + 1)``, so when ``B_new = r * B_old``
every old border coincides with every r-th new border — each coarse bucket is
the disjoint union of exactly ``r`` fine buckets. Setting, for fine bucket
``j`` inside coarse bucket ``K``::

    w2_new[:, r*K + j] = w2_old[:, K]
    b2_new[r*K + j]    = b2_old[K] + log(width_new[r*K + j] / width_old[K])

makes the fine model's softmax distribute the coarse bucket's mass across its
sub-buckets proportionally to their widths — i.e. the piecewise-constant
density is IDENTICAL to the coarse model's on the interior (verified in
tests/test_warmstart.py to ~1e-6). Only the two half-normal tail buckets
differ (the fine tail is narrower), which fine-tuning immediately repairs.

Reference analog: none — the reference consumes TabPFN's fixed 5k-bin head
as-is (npe_pfn.py:140-151); owning the model lets this framework trade head
resolution against training budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import bar_distribution as bar
from ..models.checkpoint import load as load_checkpoint
from ..models.config import TabICAConfig
from ..models.regressor import TabICAModel


def upsample_head(params, num_bars_old: int, num_bars_new: int, bar_range: float):
    """Return params with head.w2/b2 upsampled from num_bars_old to
    num_bars_new buckets, preserving the interior density exactly."""
    if num_bars_new == num_bars_old:
        return params
    if num_bars_new % num_bars_old != 0:
        raise ValueError(
            f"num_bars_new ({num_bars_new}) must be a multiple of "
            f"num_bars_old ({num_bars_old}) for exact head upsampling"
        )
    r = num_bars_new // num_bars_old
    borders_old = bar.make_borders(num_bars_old, bar_range)
    borders_new = bar.make_borders(num_bars_new, bar_range)
    w_old = borders_old[1:] - borders_old[:-1]  # [B_old]
    w_new = borders_new[1:] - borders_new[:-1]  # [B_new]

    head = params["head"]
    w2 = jnp.repeat(head["w2"], r, axis=-1)  # [2d, B_new]
    b2 = jnp.repeat(head["b2"], r, axis=-1) + (
        jnp.log(w_new) - jnp.repeat(jnp.log(w_old), r)
    )
    params = dict(params)
    params["head"] = {**head, "w2": w2, "b2": b2.astype(head["b2"].dtype)}
    return params


def load_warmstart(path: str, cfg: TabICAConfig) -> TabICAModel:
    """Load a checkpoint and adapt it to ``cfg`` (head upsampling only; the
    trunk shape must match)."""
    src = load_checkpoint(path)
    if (
        src.cfg.d_model != cfg.d_model
        or src.cfg.num_layers != cfg.num_layers
        or src.cfg.num_heads != cfg.num_heads
        or src.cfg.max_features != cfg.max_features
    ):
        raise ValueError(
            f"warmstart trunk mismatch: checkpoint {src.cfg} vs target {cfg}"
        )
    if src.cfg.bar_range != cfg.bar_range:
        raise ValueError("warmstart requires identical bar_range")
    params = upsample_head(src.params, src.cfg.num_bars, cfg.num_bars, cfg.bar_range)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return TabICAModel(
        cfg=cfg, params=params, borders=bar.make_borders(cfg.num_bars, cfg.bar_range)
    )
