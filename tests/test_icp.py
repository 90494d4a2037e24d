import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pcaccumulation_tpu.ops.icp import icp_point_to_point
from pcaccumulation_tpu.ops import se3


def test_icp_recovers_small_pose(rng):
    tgt = (rng.random((500, 3)) * 8).astype(np.float32)
    rot = Rotation.from_euler("z", 4.0, degrees=True).as_matrix().astype(np.float32)
    trans = np.array([0.08, -0.05, 0.02], np.float32)
    # src = inverse-transformed target points (so aligning src->tgt needs (rot, trans))
    src = ((tgt - trans) @ rot).astype(np.float32)

    pose = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(len(src), bool), jnp.ones(len(tgt), bool),
        threshold=0.5, max_iterations=20,
    )
    expected = np.eye(4, dtype=np.float32)
    expected[:3, :3] = rot
    expected[:3, 3] = trans
    rot_err = float(se3.rotation_error_deg(pose[:3, :3], jnp.asarray(rot)))
    trans_err = float(np.linalg.norm(np.asarray(pose[:3, 3]) - trans))
    assert rot_err < 0.2, rot_err
    assert trans_err < 0.02, trans_err


def test_icp_composes_init_pose(rng):
    tgt = (rng.random((300, 3)) * 5).astype(np.float32)
    src = tgt.copy()
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = [1.0, 0.0, 0.0]  # wrong init: shifts src away
    pose = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(len(src), bool), jnp.ones(len(tgt), bool),
        init_pose=jnp.asarray(init), threshold=2.0, max_iterations=30,
    )
    # refined pose must undo the bad init: pose ~ identity overall
    moved = np.asarray(se3.apply_transform(jnp.asarray(src), pose))
    assert np.abs(moved - tgt).max() < 0.05


def _pose_zrot(deg, trans):
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = Rotation.from_euler("z", deg, degrees=True).as_matrix()
    p[:3, 3] = trans
    return p


def test_refine_ego_poses_tightens_perturbed_estimate(rng):
    """Wired ego ICP (pose_estimation.icp): a perturbed frame->anchor pose
    must be pulled toward the ground truth."""
    from pcaccumulation_tpu.ops.icp import refine_ego_poses

    n_per, t_frames = 400, 3
    anchor = (rng.random((n_per, 3)) * 10).astype(np.float32)
    gt = [np.eye(4, dtype=np.float32),
          _pose_zrot(3.0, [0.4, -0.2, 0.0]),
          _pose_zrot(-2.0, [0.1, 0.5, 0.0])]
    pts, tid = [anchor], [np.zeros(n_per, np.int32)]
    for t in range(1, t_frames):
        inv = np.linalg.inv(gt[t])
        pts.append((anchor @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32))
        tid.append(np.full(n_per, t, np.int32))
    points = np.concatenate(pts)[None]
    time_idx = np.concatenate(tid)[None]
    valid = np.ones_like(time_idx, bool)

    perturbed = np.stack([
        np.eye(4, dtype=np.float32),
        _pose_zrot(4.5, [0.55, -0.32, 0.0]),   # ~1.5 deg, ~0.2 m off
        _pose_zrot(-3.4, [0.0, 0.38, 0.0]),
    ])[None]

    refined = np.asarray(refine_ego_poses(
        jnp.asarray(points), jnp.asarray(time_idx), jnp.asarray(valid),
        jnp.asarray(valid), jnp.asarray(perturbed),
        threshold=0.5, max_iterations=30,
    ))
    for t in range(1, t_frames):
        err_before = float(se3.rotation_error_deg(
            jnp.asarray(perturbed[0, t, :3, :3]), jnp.asarray(gt[t][:3, :3])))
        err_after = float(se3.rotation_error_deg(
            jnp.asarray(refined[0, t, :3, :3]), jnp.asarray(gt[t][:3, :3])))
        assert err_after < 0.3 < err_before, (t, err_before, err_after)
        t_after = np.linalg.norm(refined[0, t, :3, 3] - gt[t][:3, 3])
        assert t_after < 0.05, (t, t_after)
    np.testing.assert_allclose(refined[0, 0], np.eye(4))


def test_refine_ego_poses_empty_frame_keeps_init(rng):
    from pcaccumulation_tpu.ops.icp import refine_ego_poses

    points = (rng.random((1, 50, 3)) * 5).astype(np.float32)
    time_idx = np.zeros((1, 50), np.int32)  # frame 1 has zero points
    valid = np.ones((1, 50), bool)
    init = np.stack([np.eye(4, dtype=np.float32),
                     _pose_zrot(5.0, [1.0, 0.0, 0.0])])[None]
    refined = np.asarray(refine_ego_poses(
        jnp.asarray(points), jnp.asarray(time_idx), jnp.asarray(valid),
        jnp.asarray(valid), jnp.asarray(init)))
    np.testing.assert_allclose(refined, init)


def test_refine_instance_poses_tightens_perturbed_estimate(rng):
    """Wired tpointnet ICP (tpointnet.icp): per-instance perturbed motion
    is corrected toward identity residual."""
    from pcaccumulation_tpu.ops.icp import refine_instance_poses

    n_per, t_frames, g = 200, 2, 2
    base = (rng.random((n_per, 3)) * 4).astype(np.float32)
    gt_motion = _pose_zrot(5.0, [0.8, 0.3, 0.0])  # frame1 -> frame0, inst 1
    # instance 1 points: frame 0 at base, frame 1 = inverse-moved base
    inv = np.linalg.inv(gt_motion)
    f1 = (base @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    points = np.concatenate([base, f1])
    time_idx = np.concatenate([np.zeros(n_per, np.int32), np.ones(n_per, np.int32)])
    gid = np.ones(2 * n_per, np.int32)  # all in instance slot 1
    valid = np.ones(2 * n_per, bool)

    pose_est = np.broadcast_to(np.eye(4, dtype=np.float32), (g, t_frames, 4, 4)).copy()
    pose_est[1, 1] = _pose_zrot(3.2, [0.55, 0.12, 0.0])  # off by ~2 deg

    refined = np.asarray(refine_instance_poses(
        jnp.asarray(points), jnp.asarray(time_idx), jnp.asarray(gid),
        jnp.asarray(valid), jnp.asarray(pose_est),
        threshold=0.6, max_iterations=30, max_points=512,
    ))
    err_before = float(se3.rotation_error_deg(
        jnp.asarray(pose_est[1, 1, :3, :3]), jnp.asarray(gt_motion[:3, :3])))
    err_after = float(se3.rotation_error_deg(
        jnp.asarray(refined[1, 1, :3, :3]), jnp.asarray(gt_motion[:3, :3])))
    assert err_after < 0.3 < err_before, (err_before, err_after)
    # empty instance slot 0 keeps its (identity) pose
    np.testing.assert_allclose(refined[0], pose_est[0])
