"""Context-filtering strategies (TPU-native).

Analog of the reference's filter functions (reference:
support_posterior.py:326-369): given the observation, all training sims
(θ, x), and a target context size, select which sims become the TabICA
context. The reference returns variably-sized tensors; here every filter
returns fixed-shape padded arrays plus a row mask so the downstream sampler
compiles once.

Contract (kept from the reference, support_posterior.py:326): filters return
``(theta_ctx, x_ctx, ctx_mask)`` in that order.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

FilterFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


def _pad_to(arr: jnp.ndarray, size: int) -> jnp.ndarray:
    n = arr.shape[0]
    if n >= size:
        return arr[:size]
    pad = [(0, size - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def _mask_for(n: int, size: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (size,), 0) < min(n, size)


def no_filtering(obs, theta, x, context_size: int, rng=None):
    """Keep everything (truncated to context_size — the reference relies on
    TabPFN erroring above its row limit instead, support_posterior.py:342)."""
    n = theta.shape[0]
    return _pad_to(theta, context_size), _pad_to(x, context_size), _mask_for(n, context_size)


def latest_filtering(obs, theta, x, context_size: int, rng=None):
    """Most recent context_size sims (support_posterior.py:346-348)."""
    n = theta.shape[0]
    if n > context_size:
        theta, x = theta[-context_size:], x[-context_size:]
    return _pad_to(theta, context_size), _pad_to(x, context_size), _mask_for(n, context_size)


def random_filtering(obs, theta, x, context_size: int, rng=None):
    """Uniform random subset (support_posterior.py:351-354)."""
    n = theta.shape[0]
    if n <= context_size:
        return no_filtering(obs, theta, x, context_size)
    assert rng is not None, "random_filtering needs a PRNG key"
    idx = jax.random.permutation(rng, n)[:context_size]
    return theta[idx], x[idx], _mask_for(context_size, context_size)


def standardized_euclidean_filtering(obs, theta, x, context_size: int, rng=None):
    """Top-k nearest sims to the observation in z-scored x space
    (support_posterior.py:357-369). One jnp.top_k on device — no sort on
    host. The std is ε-guarded (the reference divides by raw std and can NaN
    on constant features, support_posterior.py:361-362; SURVEY §7.5 fix)."""
    n = theta.shape[0]
    if n <= context_size:
        return no_filtering(obs, theta, x, context_size)
    sd = jnp.maximum(jnp.std(x, axis=0), 1e-9)
    d2 = jnp.sum(jnp.square((x - obs) / sd), axis=-1)
    _, idx = jax.lax.top_k(-d2, context_size)
    return theta[idx], x[idx], _mask_for(context_size, context_size)


_FILTERS = {
    "no_filtering": no_filtering,
    "latest_filtering": latest_filtering,
    "random_filtering": random_filtering,
    "standardized_euclidean_filtering": standardized_euclidean_filtering,
}


def get_filtering_method(name_or_fn: Union[str, FilterFn]) -> FilterFn:
    """Factory accepting names or callables (support_posterior.py:327-339)."""
    if callable(name_or_fn):
        return name_or_fn
    if name_or_fn not in _FILTERS:
        raise ValueError(
            f"unknown filter {name_or_fn!r}; available: {sorted(_FILTERS)} or a callable"
        )
    return _FILTERS[name_or_fn]
