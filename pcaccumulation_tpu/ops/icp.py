"""Batched point-to-point ICP — the reference's optional Open3D refinement.

JAX equivalent of refine_pose_with_icp (models/egomotion.py:9-28) and
AlignNet.run_icp (models/alignnet.py:54-92): nearest neighbours within a
correspondence threshold, Kabsch update, fixed iteration count (Open3D's
convergence criteria become a static max_iterations — extra iterations on
converged problems are no-ops). Default-off in configs, matching
configs/default.yaml:115-117 of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcaccumulation_tpu.kernels.chamfer import nn_bruteforce_ref, nn_pallas
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.kabsch import weighted_kabsch


def icp_point_to_point(
    src,
    tgt,
    src_valid,
    tgt_valid,
    init_pose=None,
    threshold: float = 0.15,
    max_iterations: int = 50,
    use_pallas: bool | None = None,
):
    """Refine a rigid pose aligning src -> tgt.

    src [N, 3], tgt [M, 3], masks bool. Returns the refined [4, 4] pose
    (composed with init_pose like egomotion.py:25: tsfm @ initial_pose).

    use_pallas=None (default) picks the Pallas tiled-NN kernel on TPU and
    the jnp reference elsewhere, so TPU runs always exercise the kernel
    (bench.py's companion check validates it on hardware every round).
    """
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=src.dtype)
    src0 = se3.apply_transform(src, init_pose)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    nn_fn = nn_pallas if use_pallas else nn_bruteforce_ref
    eye = jnp.eye(4, dtype=src.dtype)

    def body(_, carry):
        pose, src_t = carry
        d2, idx = nn_fn(src_t, tgt, tgt_valid)
        w = ((d2 < threshold * threshold) & src_valid).astype(src.dtype)
        rot, trans = weighted_kabsch(src_t, tgt[idx], w)
        delta = se3.make_transform(rot, trans)
        # <3 correspondences within threshold: Kabsch is degenerate, hold
        delta = jnp.where(jnp.sum(w) >= 3, delta, eye)
        return se3.compose(delta, pose), se3.apply_transform(src_t, delta)

    pose, _ = jax.lax.fori_loop(
        0, max_iterations, body,
        (eye, src0),
    )
    # empty src/tgt masks (e.g. an unoccupied instance/frame slot): keep
    # the initial pose untouched
    ok = (jnp.sum(src_valid) >= 3) & (jnp.sum(tgt_valid) >= 3)
    return jnp.where(ok, se3.compose(pose, init_pose), init_pose)


def refine_ego_poses(
    points,       # [B, N, 3] raw per-frame points
    time_idx,     # [B, N] int
    point_valid,  # [B, N] bool
    point_bg,     # [B, N] bool — estimated background points
    poses,        # [B, T, 4, 4] chained frame->anchor estimates
    threshold: float = 0.15,
    max_iterations: int = 50,
):
    """Ego-pose ICP refinement (models/egomotion.py:360-384, :440).

    Each frame t>0's estimated background points are ICP-aligned to the
    anchor frame's estimated background points, initialised from the
    current pose estimate. Frame 0 stays identity. Non-differentiable in
    the reference (Open3D on host) — callers stop-gradient the result.
    """
    t_frames = poses.shape[1]
    base = point_valid & point_bg

    def per_frame(pts, masks0, maskst, pose_t):
        return icp_point_to_point(
            pts, pts, maskst, masks0,
            init_pose=pose_t, threshold=threshold,
            max_iterations=max_iterations,
        )

    def per_batch(pts, base_b, tid_b, poses_b):
        mask0 = base_b & (tid_b == 0)
        maskt = base_b[None, :] & (
            tid_b[None, :] == jnp.arange(1, t_frames)[:, None]
        )  # [T-1, N]
        refined = jax.vmap(
            lambda m_t, p_t: per_frame(pts, mask0, m_t, p_t)
        )(maskt, poses_b[1:])
        return jnp.concatenate([poses_b[:1], refined], axis=0)

    return jax.vmap(per_batch)(points, base, time_idx, poses)


def refine_instance_poses(
    points,     # [P, 3] flattened anchor-frame points (already ego-compensated)
    time_idx,   # [P] int
    inst_gid,   # [P] int global instance slot in [0, G)
    valid,      # [P] bool — instance-reconstruction mask
    pose_est,   # [G, T, 4, 4] estimated per-instance motions
    threshold: float = 0.25,
    max_iterations: int = 50,
    max_points: int = 1024,
):
    """Per-instance ICP refinement (models/alignnet.py:95-112, :266).

    Reconstructs points with the current estimate, then ICP-aligns each
    (instance, frame>0) slice to that instance's frame-0 slice and
    left-composes the correction: pose <- refined @ pose. Instances or
    frames with too few points keep their pose (the reference skips empty
    selections the same way). Points per instance are capped at
    `max_points` by gathering into a static buffer.
    """
    g, t_frames = pose_est.shape[:2]
    rec = se3.reconstruct_sequence(points, time_idx, inst_gid, pose_est)

    max_points = min(max_points, points.shape[0])
    member = valid[None, :] & (inst_gid[None, :] == jnp.arange(g)[:, None])
    score = member.astype(jnp.float32)  # [G, P]
    _, sel = jax.lax.top_k(score, max_points)  # [G, max_points]
    sel_valid = jnp.take_along_axis(member, sel, axis=1)
    inst_pts = rec[sel]          # [G, max_points, 3]
    inst_tid = time_idx[sel]     # [G, max_points]

    def per_inst(pts, tid, val):
        mask0 = val & (tid == 0)
        maskt = val[None, :] & (
            tid[None, :] == jnp.arange(1, t_frames)[:, None]
        )
        refined = jax.vmap(
            lambda m_t: icp_point_to_point(
                pts, pts, m_t, mask0,
                threshold=threshold, max_iterations=max_iterations,
            )
        )(maskt)  # [T-1, 4, 4]
        eye = jnp.eye(4, dtype=pts.dtype)[None]
        return jnp.concatenate([eye, refined], axis=0)

    correction = jax.vmap(per_inst)(inst_pts, inst_tid, sel_valid)  # [G,T,4,4]
    return se3.compose(correction, pose_est)
