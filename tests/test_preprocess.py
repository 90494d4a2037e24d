"""Preprocessing core: boxes -> labels + instance motion consistency."""

import numpy as np
import jax.numpy as jnp

from tools.preprocess import core
from pcaccumulation_tpu.ops import se3


def _pose(yaw, xyz):
    m = np.eye(4)
    m[:3, :3] = core.yaw_matrix(yaw)
    m[:3, 3] = xyz
    return m


def test_points_in_box(rng):
    box = np.array([2.0, 1.0, 0.5, 4.0, 2.0, 1.5, 0.7])
    corners = core.box_corners(box)
    inside_pts = box[:3] + (rng.random((50, 3)) - 0.5) * 0.5
    assert core.points_in_box(inside_pts, box).all()
    far_pts = inside_pts + 10.0
    assert not core.points_in_box(far_pts, box).any()
    # corners are (numerically) on the boundary
    assert core.points_in_box(corners * 0.999 + box[:3] * 0.001, box).all()


def test_instance_motion_from_boxes():
    # a box translating and yawing between frames
    T = 3
    boxes = np.zeros((1, T, 7))
    for t in range(T):
        boxes[0, t] = [1.0 + 2.0 * t, 0.5 * t, 0.0, 4.0, 2.0, 1.5, 0.1 * t]
    valid = np.ones((1, T), bool)
    tsfm = core.instance_motion_from_boxes(boxes, valid)
    assert tsfm.shape == (2, T, 4, 4)
    np.testing.assert_allclose(tsfm[0], np.tile(np.eye(4), (T, 1, 1)), atol=1e-6)
    # applying tsfm to frame-t corners recovers frame-0 corners
    for t in range(T):
        c_t = core.box_corners(boxes[0, t])
        moved = (tsfm[1, t, :3, :3] @ c_t.T).T + tsfm[1, t, :3, 3]
        np.testing.assert_allclose(moved, core.box_corners(boxes[0, 0]), atol=1e-5)


def test_build_sample_roundtrip(rng):
    """A generated sample must satisfy the runtime GT contract: ego comp +
    instance reconstruction collapses moving objects to frame 0."""
    T, freq = 4, 10.0
    # ego moves forward
    ego_world = [_pose(0.02 * t, [1.5 * t, 0.1 * t, 0]) for t in range(T)]
    inv_p0 = np.linalg.inv(ego_world[0])
    ego_motion_gt = np.stack([inv_p0 @ p for p in ego_world])

    # one moving box + one parked box, in anchor(frame0-ego) coordinates
    boxes = np.zeros((2, T, 7))
    for t in range(T):
        boxes[0, t] = [5.0 + 1.0 * t, 2.0, 0.0, 4.0, 2.0, 1.5, 0.0]   # moving
        boxes[1, t] = [-6.0, -3.0, 0.0, 4.0, 2.0, 1.5, 0.3]           # parked
    valid = np.ones((2, T), bool)

    frame_points = []
    for t in range(T):
        bg = (rng.random((300, 3)) - 0.5) * 30
        obj0 = boxes[0, t, :3] + (rng.random((100, 3)) - 0.5) * [3.5, 1.5, 1.2]
        obj1 = boxes[1, t, :3] + (rng.random((100, 3)) - 0.5) * [3.5, 1.5, 1.2]
        frame_points.append(np.concatenate([bg, obj0, obj1]))

    sample = core.build_sample(
        frame_points, ego_motion_gt, boxes, valid,
        foreground=np.array([True, True]), freq=freq,
    )

    assert sample["fb_labels"].sum() > 0
    # parked box: fb 1, sd 0; moving box: sd 1 (10 m/s >> 0.5)
    inst = sample["inst_labels"]
    assert np.all(sample["sd_labels"][inst == 1] == 1)
    assert np.all(sample["sd_labels"][inst == 2] == 0)
    assert np.all(sample["fb_labels"][inst > 0] == 1)

    # the GT contract: reconstruction collapses instance 1 across frames
    pts = jnp.asarray(sample["raw_points"])
    tid = jnp.asarray(sample["time_indice"])
    comp = se3.ego_motion_compensation(pts, tid, jnp.asarray(sample["ego_motion_gt"]))
    rec = np.asarray(se3.reconstruct_sequence(
        comp, tid, jnp.asarray(inst), jnp.asarray(sample["bbox_tsfm"])
    ))
    tid_np = np.asarray(tid)
    sel0 = (inst == 1) & (tid_np == 0)
    for t in range(1, T):
        selt = (inst == 1) & (tid_np == t)
        assert np.linalg.norm(rec[selt].mean(0) - rec[sel0].mean(0)) < 0.2
