"""Masked multi-class Lovász-Softmax loss, jit-safe.

Equivalent of the reference's libs/lovasz_softmax.py:56-107 (sort +
cumulative Jaccard gradient), extended with a validity mask so padded
points contribute nothing: invalid entries get error 0 and fg 0, which
sorts them to the tail where the dot product term vanishes. Classes with
no positives among valid points are excluded from the mean, matching the
reference's `continue` branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _take_perm(x, order):
    """``x[order]`` where ``order`` is a permutation of arange(len(x)).

    The default gather VJP emits a generic scatter-add; declaring the
    indices unique (a sort permutation always is) unlocks XLA's fast
    scatter path — the Lovász sort backward profiled ~0.6 ms/step at
    bench shapes before this (trace: transpose(jvp())/scatter-add
    lovasz.py)."""

    @jax.custom_vjp
    def take(xx, oo):
        return xx[oo]

    def fwd(xx, oo):
        return xx[oo], oo

    def bwd(oo, g):
        zeros = jnp.zeros(g.shape, g.dtype)  # permutation: same shape as x
        return zeros.at[oo].set(g, mode="drop", unique_indices=True), None

    take.defvjp(fwd, bwd)
    return take(x, order)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors [P]."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, _EPS)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Lovász-Softmax over flat predictions.

    Args:
      probas: [P, C] class probabilities (softmax output).
      labels: [P] int labels in [0, C).
      valid: [P] bool; False entries are ignored.

    Returns scalar loss (mean over classes present among valid points).
    """
    p, c = probas.shape
    if valid is None:
        valid = jnp.ones((p,), bool)
    validf = valid.astype(probas.dtype)

    losses = []
    present = []
    for cls in range(c):
        fg = ((labels == cls) & valid).astype(probas.dtype)  # [P]
        errors = jnp.abs(fg - probas[:, cls]) * validf
        # descending sort; invalid entries (0 error) land at the tail
        order = jnp.argsort(-errors)
        errors_sorted = _take_perm(errors, order)
        fg_sorted = fg[order]  # no grad path: fg is labels-only
        grad = _lovasz_grad(fg_sorted)
        losses.append(jnp.dot(errors_sorted, grad))
        present.append((jnp.sum(fg) > 0).astype(probas.dtype))

    losses = jnp.stack(losses)
    present = jnp.stack(present)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
