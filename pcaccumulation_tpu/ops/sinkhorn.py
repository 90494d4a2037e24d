"""Log-domain Sinkhorn normalisation with slack row/column.

Equivalent of the reference's EgoMotionHead.sinkhorn
(models/egomotion.py:100-137): pad the log-affinity with a zero slack row
and column, then alternately log-normalise rows (all but the slack row) and
columns (all but the slack column). Vectorised over arbitrary leading batch
dims and unrolled for a small static iteration count (3 in the configs).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def log_sinkhorn(log_alpha: jnp.ndarray, n_iters: int, slack: bool = True) -> jnp.ndarray:
    """Run Sinkhorn iterations in log space.

    Args:
      log_alpha: [..., J, K] log affinity.
      n_iters: static number of iterations.
      slack: include a slack row/col (the only mode the reference configs use).

    Returns:
      [..., J, K] log of the (near) doubly-stochastic matrix, slack removed.
    """
    if not slack:
        la = log_alpha
        for _ in range(n_iters):
            la = la - logsumexp(la, axis=-1, keepdims=True)
            la = la - logsumexp(la, axis=-2, keepdims=True)
        return la

    batch = log_alpha.shape[:-2]
    j, k = log_alpha.shape[-2:]
    padded = jnp.zeros(batch + (j + 1, k + 1), log_alpha.dtype)
    padded = padded.at[..., :j, :k].set(log_alpha)

    for _ in range(n_iters):
        # row normalisation, skipping the slack row
        row_lse = logsumexp(padded[..., :j, :], axis=-1, keepdims=True)
        padded = jnp.concatenate(
            [padded[..., :j, :] - row_lse, padded[..., j:, :]], axis=-2
        )
        # column normalisation, skipping the slack column
        col_lse = logsumexp(padded[..., :, :k], axis=-2, keepdims=True)
        padded = jnp.concatenate(
            [padded[..., :, :k] - col_lse, padded[..., :, k:]], axis=-1
        )

    return padded[..., :j, :k]


def square_distance(a: jnp.ndarray, b: jnp.ndarray, normalised: bool = False) -> jnp.ndarray:
    """Pairwise squared L2 distance between [..., N, C] and [..., M, C].

    Matches toolbox/utils.py:125-144: for L2-normalised features the
    distance simplifies to 2 - 2 a.b^T; clamped at a small positive floor.
    """
    if normalised:
        dist = 2.0 - 2.0 * jnp.einsum("...nc,...mc->...nm", a, b)
    else:
        aa = jnp.sum(a * a, axis=-1)[..., :, None]
        bb = jnp.sum(b * b, axis=-1)[..., None, :]
        dist = aa + bb - 2.0 * jnp.einsum("...nc,...mc->...nm", a, b)
    return jnp.clip(dist, 1e-12, None)
