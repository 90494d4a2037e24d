"""SE(3) geometry utilities, fully batched / jit-safe.

Functional equivalents of the reference's toolbox/register_utils.py and
toolbox/se3_utils.py (see /root/reference/toolbox/register_utils.py:19-115,
se3_utils.py:44-66), written as pure jnp ops that broadcast over arbitrary
leading batch dimensions instead of Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-7


def make_transform(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] homogeneous transforms from [...,3,3] + [...,3]."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    trans = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # [...,3,4]
    bottom = jnp.zeros(batch + (1, 4), rot.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_inverse(tsfm: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid transforms [..., 4, 4]."""
    rot = tsfm[..., :3, :3]
    trans = tsfm[..., :3, 3]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    trans_inv = -jnp.einsum("...ij,...j->...i", rot_inv, trans, precision=_HI)
    return make_transform(rot_inv, trans_inv)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose rigid transforms: result = a @ b."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HI)


def apply_transform(points: jnp.ndarray, tsfm: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] transform(s) to [..., N, 3] points."""
    rot = tsfm[..., :3, :3]
    trans = tsfm[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points, precision=_HI) + trans[..., None, :]


def apply_transform_per_point(points: jnp.ndarray, tsfm: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-point transform: points [..., N, 3], tsfm [..., N, 4, 4]."""
    rot = tsfm[..., :3, :3]
    trans = tsfm[..., :3, 3]
    return jnp.einsum("...nij,...nj->...ni", rot, points, precision=_HI) + trans


def relative_pose(tsfm_src: jnp.ndarray, tsfm_tgt: jnp.ndarray) -> jnp.ndarray:
    """T_rel with T_rel @ X_src = X_tgt-frame: inv(T_tgt) @ T_src.

    Matches get_relative_pose_torch for waymo/nuscene
    (register_utils.py:184-197) via a linear solve.
    """
    return jnp.linalg.solve(tsfm_tgt, tsfm_src)


def _apply_indexed_rows(
    points: jnp.ndarray, rows: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Apply rows[idx[n]] (a flattened [R|t], [..., S, 12]) to points [..., N, 3].

    Gathering flat 12-wide rows and expanding the 3x4 matrix-vector
    product as lane arithmetic keeps every tensor 2-D. The obvious
    `take_along_axis(tsfm, idx) -> [N, 4, 4]` formulation forces XLA into
    T(4,128)-tiled [N,4,4] intermediates (32x pad waste) — it profiled
    ~1.4 ms at N=60k on v5e vs ~0.05 ms for this form.
    """
    m = jnp.take_along_axis(rows, idx[..., None].astype(jnp.int32), axis=-2)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return jnp.stack(
        [
            m[..., 0] * x + m[..., 1] * y + m[..., 2] * z + m[..., 3],
            m[..., 4] * x + m[..., 5] * y + m[..., 6] * z + m[..., 7],
            m[..., 8] * x + m[..., 9] * y + m[..., 10] * z + m[..., 11],
        ],
        axis=-1,
    )


def ego_motion_compensation(
    points: jnp.ndarray, time_idx: jnp.ndarray, tsfm: jnp.ndarray
) -> jnp.ndarray:
    """Transform each point by the pose of its frame.

    points [..., N, 3]; time_idx int [..., N]; tsfm [..., T, 4, 4].
    Mirrors register_utils.py:59-69 as a gather-transform.
    """
    t = tsfm.shape[-3]
    rows = tsfm[..., :3, :].reshape(tsfm.shape[:-3] + (t, 12))
    return _apply_indexed_rows(points, rows, time_idx)


def reconstruct_sequence(
    points: jnp.ndarray,
    time_idx: jnp.ndarray,
    inst_idx: jnp.ndarray,
    tsfm: jnp.ndarray,
) -> jnp.ndarray:
    """Per-(instance, frame) rigid reconstruction.

    points [..., N, 3]; time_idx/inst_idx int [..., N];
    tsfm [..., K, T, 4, 4]. Mirrors register_utils.py:72-93: each point is
    moved by tsfm[inst, t]. Out-of-range instance indices must be clipped by
    the caller (used for masking padded points).
    """
    K, T = tsfm.shape[-4], tsfm.shape[-3]
    rows = tsfm[..., :3, :].reshape(tsfm.shape[:-4] + (K * T, 12))
    idx = (inst_idx.astype(jnp.int32) * T + time_idx.astype(jnp.int32)).clip(0, K * T - 1)
    return _apply_indexed_rows(points, rows, idx)


def rotation_error_deg(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Angular geodesic distance in degrees between [..., 3, 3] rotations.

    Mirrors register_utils.py:19-43.
    """
    m = jnp.einsum("...ji,...jk->...ik", r1, r2, precision=_HI)  # r1^T @ r2
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """L2 distance between [..., 3] translations (register_utils.py:46-57)."""
    return jnp.linalg.norm(t1 - t2, axis=-1)


def quat_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x, y, z, w] (scipy order) to rotation matrix [..., 3, 3].

    Mirrors se3_utils.py:44-66. The caller must normalise the quaternion.
    """
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    x2, y2, z2, w2 = x * x, y * y, z * z, w * w
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] to quaternion [x, y, z, w], scipy order.

    Branchless Shepperd-style extraction: compute all four candidate
    quaternions and select the one keyed by the largest diagonal element
    (numerically stable, jit-safe). Replaces the reference's host-side
    scipy conversion (tpointnet.py:63-68).
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each scaled by 4*q_key^2 (q = [x, y, z, w])
    qw = jnp.stack([tr + 1.0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qw = jnp.stack([qw[..., 1], qw[..., 2], qw[..., 3], qw[..., 0]], axis=-1)
    qx = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    qy = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    qz = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    cand = jnp.stack([qx, qy, qz, qw], axis=-2)  # [..., 4(which), 4(xyzw)]
    key = jnp.stack([m00, m11, m22, tr], axis=-1)
    best = jnp.argmax(key, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    q = q / (jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-12)) + _EPS)
    # canonical sign: w >= 0 (scipy does not enforce this, but losses compare
    # quaternion differences so a consistent convention is required)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q


def euler_z_matrix(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +z by yaw (radians), [...] -> [..., 3, 3]."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    m = jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1)
    return m.reshape(yaw.shape + (3, 3))
