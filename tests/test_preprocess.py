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


def _zrot_pose(deg, trans):
    th = np.deg2rad(deg)
    m = np.eye(4)
    m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    m[:3, 3] = trans
    return m


def test_quat_helpers_match_scipy(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        q_xyzw = Rotation.random(random_state=rng.integers(1 << 30)).as_quat()
        q_wxyz = np.r_[q_xyzw[3], q_xyzw[:3]]
        np.testing.assert_allclose(
            core.quat_wxyz_to_matrix(q_wxyz),
            Rotation.from_quat(q_xyzw).as_matrix(), atol=1e-9,
        )
    yaw = core.quat_wxyz_yaw(
        np.r_[np.cos(0.3), 0, 0, np.sin(0.3)]
    )
    np.testing.assert_allclose(yaw, 0.6, atol=1e-9)


def test_nuscenes_sweep_window_to_anchor(rng):
    """Ego chain: points of every sweep land in the anchor frame; the
    returned ego matrices reproduce the chained global poses."""
    from tools.preprocess.nuscenes_convert import sweep_window_to_anchor

    # a fixed world landmark seen from three sensor poses
    landmark = np.array([[10.0, 5.0, 1.0], [12.0, -3.0, 0.5]])
    poses_g = [_zrot_pose(0, [0, 0, 0]),
               _zrot_pose(10, [-1.0, 0.3, 0.0]),
               _zrot_pose(20, [-2.0, 0.7, 0.0])]
    sweeps = []
    for g in poses_g:
        inv = np.linalg.inv(g)
        sensor_pts = (inv[:3, :3] @ landmark.T).T + inv[:3, 3]
        sweeps.append({"points": sensor_pts, "global_from_sensor": g})

    frame_points, ego = sweep_window_to_anchor(sweeps)
    # anchor == sweep 0 and its global pose is identity here, so every
    # sweep's points must map back onto the landmark
    for t in range(3):
        np.testing.assert_allclose(frame_points[t], landmark, atol=1e-9)
        np.testing.assert_allclose(
            ego[t], np.linalg.inv(poses_g[0]) @ poses_g[t], atol=1e-12
        )
    np.testing.assert_allclose(ego[0], np.eye(4), atol=1e-12)


def test_nuscenes_extrapolate_boxes():
    """Velocity extrapolation: sweep t sits t/freq seconds BEFORE the
    keyframe, so centres move backwards along the velocity."""
    from tools.preprocess.nuscenes_convert import extrapolate_boxes

    freq = 20.0
    anns = [{
        "translation": [10.0, 0.0, 1.0], "yaw": 0.3,
        "size_wlh": [2.0, 5.0, 1.8],  # nuScenes order (w, l, h)
        "velocity": [4.0, 0.0, 0.0], "foreground": True,
    }, {
        "translation": [0.0, 8.0, 0.5], "yaw": 0.0,
        "size_wlh": [1.0, 1.0, 2.0],
        "velocity": [np.nan, np.nan, np.nan],  # devkit emits NaN sometimes
        "foreground": False,
    }]
    boxes, valid, fg = extrapolate_boxes(anns, np.eye(4), 3, freq)
    assert boxes.shape == (2, 3, 7) and valid.all()
    np.testing.assert_allclose(boxes[0, 0, :3], [10, 0, 1])
    np.testing.assert_allclose(boxes[0, 1, :3], [10 - 4 / freq, 0, 1])
    np.testing.assert_allclose(boxes[0, 2, :3], [10 - 8 / freq, 0, 1])
    # size reordered (w, l, h) -> (l, w, h)
    np.testing.assert_allclose(boxes[0, 0, 3:6], [5.0, 2.0, 1.8])
    np.testing.assert_allclose(boxes[1, 1, :3], [0, 8, 0.5])  # NaN vel -> 0
    assert fg.tolist() == [True, False]
    # a rotated anchor shifts both centre and yaw
    anchor_from_global = np.linalg.inv(_zrot_pose(90, [0, 0, 0]))
    boxes_r, _, _ = extrapolate_boxes(anns[:1], anchor_from_global, 1, freq)
    np.testing.assert_allclose(boxes_r[0, 0, :3], [0, -10, 1], atol=1e-9)
    np.testing.assert_allclose(boxes_r[0, 0, 6], 0.3 - np.pi / 2, atol=1e-9)


def test_waymo_assemble_window_association():
    """Box association across frames by object id, with a disappearing
    object and correct ego compensation."""
    from tools.preprocess.waymo_convert import assemble_window

    pose0 = _zrot_pose(0, [0, 0, 0])
    pose1 = _zrot_pose(0, [2.0, 0, 0])  # ego drove 2 m in +x
    # object A static at world [10, 0, 1]; object B only in frame 0
    lab_a0 = ([10.0, 0.0, 1.0], [4.0, 2.0, 1.5], 0.1)
    lab_a1 = ([8.0, 0.0, 1.0], [4.0, 2.0, 1.5], 0.1)  # vehicle coords t=1
    lab_b0 = ([-5.0, 3.0, 0.5], [1.0, 1.0, 2.0], 0.0)
    pts0 = np.array([[1.0, 1.0, 0.0]])
    pts1 = np.array([[1.0, 1.0, 0.0]])  # same vehicle coords, ego moved
    window = [
        (pts0, pose0, {"A": lab_a0, "B": lab_b0}),
        (pts1, pose1, {"A": lab_a1}),
    ]
    frame_points, ego, boxes, valid, ids = assemble_window(window)
    assert ids == ["A", "B"]
    np.testing.assert_allclose(ego[0], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(ego[1], pose1, atol=1e-12)
    # frame-1 points shifted into anchor coords by the ego motion
    np.testing.assert_allclose(frame_points[1], [[3.0, 1.0, 0.0]], atol=1e-9)
    # object A's anchor-frame centre is identical in both frames (static)
    np.testing.assert_allclose(boxes[0, 0, :3], [10, 0, 1], atol=1e-9)
    np.testing.assert_allclose(boxes[0, 1, :3], [10, 0, 1], atol=1e-9)
    assert valid.tolist() == [[True, True], [True, False]]


def test_waymo_window_to_contract(rng):
    """Full fixture pipeline: assemble_window -> build_sample yields the
    runtime contract with a moving instance labelled dynamic."""
    from tools.preprocess.waymo_convert import assemble_window

    freq = 10.0
    pose0, pose1 = _zrot_pose(0, [0, 0, 0]), _zrot_pose(0, [1.0, 0, 0])
    # object moving +2 m in x per frame (20 m/s > 0.5 threshold)
    lab0 = ([5.0, 0.0, 1.0], [4.0, 2.0, 2.0], 0.0)
    lab1 = ([6.0, 0.0, 1.0], [4.0, 2.0, 2.0], 0.0)  # 7 in anchor coords
    in_box0 = np.array([[5.0, 0.2, 1.0]])
    in_box1 = np.array([[6.0, -0.2, 1.0]])
    bg = (rng.random((20, 3)) * 4 - 2) + [0, -10, 0]
    window = [
        (np.concatenate([in_box0, bg]), pose0, {"X": lab0}),
        (np.concatenate([in_box1, bg]), pose1, {"X": lab1}),
    ]
    frame_points, ego, boxes, valid, ids = assemble_window(window)
    data = core.build_sample(frame_points, ego, boxes, valid,
                             foreground=np.ones(1, bool), freq=freq)
    for key in ("raw_points", "time_indice", "sd_labels", "fb_labels",
                "inst_labels", "sem_labels", "ego_motion_gt", "bbox_tsfm"):
        assert key in data, key
    inst = data["inst_labels"]
    t_idx = data["time_indice"]
    assert inst[t_idx == 0][0] == 1 and inst[t_idx == 1][0] == 1
    assert data["sd_labels"][0] == 1 and data["fb_labels"][0] == 1
    assert (inst[1:21] == 0).all()
    # raw points are the original per-frame vehicle coords (ego
    # compensation reversed)
    np.testing.assert_allclose(
        data["raw_points"][t_idx == 1][0], [6.0, -0.2, 1.0], atol=1e-6
    )
    # instance motion frame1->frame0 undoes the +2 m anchor-frame shift
    moved = data["bbox_tsfm"][1, 1] @ np.r_[7.0, 0.0, 1.0, 1.0]
    np.testing.assert_allclose(moved[:3], [5.0, 0.0, 1.0], atol=1e-6)


# ---------------------------------------------------------- rotated IoU ---

def test_bev_iou_axis_aligned_analytic():
    from tools.preprocess.box_iou import iou_bev, iou_3d
    a = np.array([0.0, 0, 0, 4, 2, 2, 0.0])
    b = np.array([1.0, 0.5, 0, 4, 2, 2, 0.0])  # overlap 3 x 1.5 = 4.5
    iou = iou_bev(a, b)[0, 0]
    expect = 4.5 / (8 + 8 - 4.5)
    np.testing.assert_allclose(iou, expect, atol=1e-12)
    # identical boxes
    np.testing.assert_allclose(iou_bev(a, a)[0, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(iou_3d(a, a)[0, 0], 1.0, atol=1e-12)
    # disjoint
    c = np.array([100.0, 0, 0, 4, 2, 2, 1.0])
    assert iou_bev(a, c)[0, 0] == 0.0


def test_bev_iou_rotation_invariance():
    from tools.preprocess.box_iou import iou_bev
    rng = np.random.default_rng(0)
    a = np.array([0.0, 0, 0, 4, 2, 2, 0.3])
    b = np.array([1.0, 0.5, 0, 3, 2.5, 2, -0.4])
    base = iou_bev(a, b)[0, 0]
    for _ in range(5):
        # rotating BOTH boxes (and the offset) by phi preserves IoU
        phi = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(phi), np.sin(phi)
        rot = np.array([[c, -s], [s, c]])
        a2, b2 = a.copy(), b.copy()
        a2[:2], b2[:2] = rot @ a[:2], rot @ b[:2]
        a2[6] += phi
        b2[6] += phi
        np.testing.assert_allclose(iou_bev(a2, b2)[0, 0], base, atol=1e-10)


def test_bev_iou_matches_monte_carlo():
    from tools.preprocess.box_iou import iou_bev
    from tools.preprocess.core import points_in_box
    rng = np.random.default_rng(1)
    boxes = np.stack([
        np.concatenate([rng.uniform(-2, 2, 2), [0.0],
                        rng.uniform(1, 5, 2), [4.0],
                        rng.uniform(-np.pi, np.pi, 1)])
        for _ in range(6)
    ])
    iou = iou_bev(boxes, boxes)
    # Monte Carlo over a grid (z=0 center plane, boxes are z-thick enough)
    g = np.linspace(-6, 6, 601)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1)
    inside = np.stack([points_in_box(pts, b) for b in boxes])  # [K, P]
    for i in range(6):
        for j in range(6):
            inter = (inside[i] & inside[j]).sum()
            union = (inside[i] | inside[j]).sum()
            mc = inter / union
            np.testing.assert_allclose(iou[i, j], mc, atol=0.02)


def test_iou3d_z_overlap():
    from tools.preprocess.box_iou import iou_3d
    a = np.array([0.0, 0, 0.0, 2, 2, 2, 0.0])
    b = np.array([0.0, 0, 1.0, 2, 2, 2, 0.0])  # half z-overlap
    expect = (4 * 1.0) / (8 + 8 - 4)
    np.testing.assert_allclose(iou_3d(a, b)[0, 0], expect, atol=1e-12)
    c = np.array([0.0, 0, 5.0, 2, 2, 2, 0.0])  # no z-overlap
    assert iou_3d(a, c)[0, 0] == 0.0
