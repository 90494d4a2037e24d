"""Differentiable weighted Kabsch with a gradient-safe batched SVD.

TPU-native replacement for the reference's
toolbox/register_utils.py:247-317 (kabsch_transformation_estimation):
batched `jnp.linalg.svd` with the same determinant-flip correction, wrapped
in a custom VJP whose singular-value-gap denominators are regularised so
gradients stay finite on (near-)degenerate covariances — the reference
instead catches SVD failures and falls back to identity
(register_utils.py:295-304), which is not expressible under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-7
_SVD_EPS = 1e-10


@jax.custom_vjp
def safe_svd(a: jnp.ndarray):
    """SVD of [..., M, M] with gradient-safe reverse mode.

    Returns (u, s, vt) like jnp.linalg.svd(a, full_matrices=False). The VJP
    uses F_ij = gap / (gap^2 + eps) instead of 1/gap, where
    gap = s_i^2 - s_j^2, preventing blow-up on repeated singular values.
    """
    return jnp.linalg.svd(a, full_matrices=False)


def _safe_svd_fwd(a):
    out = jnp.linalg.svd(a, full_matrices=False)
    return out, out


def _safe_svd_bwd(res, cotangents):
    u, s, vt = res
    du, ds, dvt = cotangents
    v = jnp.swapaxes(vt, -1, -2)
    dv = jnp.swapaxes(dvt, -1, -2)

    s2 = s * s
    gap = s2[..., None, :] - s2[..., :, None]  # F_ij = 1 / (s_j^2 - s_i^2)
    f = gap / (gap * gap + _SVD_EPS)  # zero on the diagonal by construction

    ut_du = jnp.einsum("...ji,...jk->...ik", u, du, precision=_HI)
    vt_dv = jnp.einsum("...ji,...jk->...ik", v, dv, precision=_HI)

    j_u = f * (ut_du - jnp.swapaxes(ut_du, -1, -2))
    j_v = f * (vt_dv - jnp.swapaxes(vt_dv, -1, -2))

    eye = jnp.eye(s.shape[-1], dtype=s.dtype)
    s_mat = s[..., None, :] * eye
    ds_mat = ds[..., None, :] * eye

    inner = (
        jnp.einsum("...ij,...jk->...ik", j_u, s_mat, precision=_HI)
        + jnp.einsum("...ij,...jk->...ik", s_mat, j_v, precision=_HI)
        + ds_mat
    )
    da = jnp.einsum("...ij,...jk,...lk->...il", u, inner, v, precision=_HI)
    return (da,)


safe_svd.defvjp(_safe_svd_fwd, _safe_svd_bwd)


def weighted_kabsch(
    xs: jnp.ndarray,
    xt: jnp.ndarray,
    weights: jnp.ndarray | None = None,
):
    """Weighted Procrustes: find R, t with R @ xs + t ≈ xt.

    Args:
      xs: [..., N, 3] source points.
      xt: [..., N, 3] target correspondences.
      weights: [..., N] non-negative weights (None = uniform).

    Returns:
      rot [..., 3, 3], trans [..., 3].
    """
    if weights is None:
        weights = jnp.ones(xs.shape[:-1], xs.dtype)
    w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + _EPS)
    w = w[..., None]  # [..., N, 1]

    mu_s = jnp.sum(xs * w, axis=-2, keepdims=True)
    mu_t = jnp.sum(xt * w, axis=-2, keepdims=True)
    xs_c = xs - mu_s
    xt_c = xt - mu_t

    cov = jnp.einsum("...ni,...nj->...ij", xs_c * w, xt_c, precision=_HI)  # [..., 3, 3]

    u, s, vt = safe_svd(cov)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)

    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", v, ut, precision=_HI))
    d = jnp.ones(cov.shape[:-2] + (3,), cov.dtype).at[..., 2].set(det)
    rot = jnp.einsum("...ij,...j,...jk->...ik", v, d, ut, precision=_HI)

    trans = mu_t[..., 0, :] - jnp.einsum("...ij,...j->...i", rot, mu_s[..., 0, :], precision=_HI)
    return rot, trans


def kabsch(xs: jnp.ndarray, xt: jnp.ndarray):
    """Unweighted Kabsch convenience wrapper."""
    return weighted_kabsch(xs, xt, None)
