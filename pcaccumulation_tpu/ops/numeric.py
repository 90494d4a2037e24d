"""Gradient-safe elementary ops.

`jnp.linalg.norm` has a NaN gradient at exactly zero; with padded/masked
tensors zero rows are everywhere, and `0 * nan` poisons the backward pass.
These variants clamp the squared norm at a tiny floor so gradients vanish
smoothly instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, eps: float = 1e-12, keepdims: bool = False):
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-12):
    return x / safe_norm(x, axis=axis, eps=eps, keepdims=True)
