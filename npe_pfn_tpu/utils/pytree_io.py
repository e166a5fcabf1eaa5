"""Generic pytree <-> npz serialization (checkpointing without orbax for
small artifacts; atomic writes so a killed pretraining run never corrupts
the shipped checkpoint)."""

from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _key_name(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return f"__idx_{k.idx}"
    return str(k)


def save_pytree(path: str, tree: Any) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    for key_path, leaf in flat:
        name = "/".join(_key_name(k) for k in key_path)
        arrays[name or "__root"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(path: str) -> Any:
    """Reconstructs nested dicts/lists. Tuple/custom nodes come back as
    dicts/lists — fine for params and optax states restored via
    tree_unflatten against a template (see restore_like)."""
    data = np.load(path)
    tree: Any = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name])
    return tree


def restore_like(template: Any, path: str) -> Any:
    """Load leaves from `path` into the structure of `template` (leaf order
    must match — true for identical pytree definitions)."""
    data = np.load(path)
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, leaf in flat_t:
        name = "/".join(_key_name(k) for k in key_path) or "__root"
        arr = jnp.asarray(data[name])
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
