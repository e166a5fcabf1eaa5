"""Checkpoint save/load for TabICA models.

The model is frozen pretrained weights (the reference ships none — it
downloads TabPFN's checkpoint at runtime; here the checkpoint is a repo
artifact produced by npe_pfn_tpu.pretrain). Format: a single ``.npz`` of
flattened params plus the config as JSON — dependency-free and portable.
Orbax is used for *pretraining* run state (optimizer etc.), not for the
shipped inference artifact.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TabICAConfig
from .regressor import TabICAModel
from . import bar_distribution as bar


def save(path: str, model: TabICAModel) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(model.params)
    arrays = {}
    for key_path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        arrays[name] = np.asarray(leaf)
    # Calibration temperature rides the npz under a reserved key (param
    # paths always contain "/" so it can't collide); absent in pre-round-5
    # checkpoints, which load as the uncalibrated τ=1.
    arrays["__temperature__"] = np.asarray(model.temperature)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)
    with open(path + ".json", "w") as f:
        json.dump(dataclasses.asdict(model.cfg), f, indent=2)


def load(path: str) -> TabICAModel:
    with open(path + ".json") as f:
        cfg = TabICAConfig(**json.load(f))
    data = np.load(path)
    params: dict = {}
    temperature = jnp.asarray(1.0)
    for name in data.files:
        if name == "__temperature__":
            temperature = jnp.asarray(data[name])
            continue
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name])
    return TabICAModel(
        cfg=cfg, params=params,
        borders=bar.make_borders(cfg.num_bars, cfg.bar_range),
        temperature=temperature,
    )


def default_checkpoint_path() -> str:
    """Resolution order: env var > checkpoints/DEFAULT pointer file >
    tabica_v1.npz. The pointer file lets quality evals flip the shipped
    default (e.g. to a retrained v2) without moving artifacts."""
    env = os.environ.get("NPE_PFN_TPU_CHECKPOINT")
    if env:
        return env
    ckpt_dir = os.path.join(os.path.dirname(__file__), "..", "..", "checkpoints")
    pointer = os.path.join(ckpt_dir, "DEFAULT")
    if os.path.exists(pointer):
        with open(pointer) as f:
            name = f.read().strip()
        if name:
            cand = os.path.join(ckpt_dir, name)
            if os.path.exists(cand):
                return cand
    return os.path.join(ckpt_dir, "tabica_v1.npz")


def load_default() -> Tuple[TabICAModel, bool]:
    """Load the shipped checkpoint if present; otherwise return a randomly
    initialized model (flagged) so the stack stays runnable end-to-end."""
    path = default_checkpoint_path()
    if os.path.exists(path) and os.path.exists(path + ".json"):
        return load(path), True
    model = TabICAModel.create(jax.random.PRNGKey(0), TabICAConfig())
    return model, False
