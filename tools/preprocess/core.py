"""Dataset preprocessing core: raw frames + boxes -> training `.npz` samples.

Rebuilds the logic of the reference's dataset_toolbox (SURVEY.md §2.3,
dataset_toolbox/prep_nuscene_waymo_sf/{waymo,nuscene}.py):

  * per-point instance ids from oriented 3D boxes (points-in-rbbox),
  * static/dynamic labels from instance speed (> speed_threshold m/s,
    waymo.py:104 + configs/default.yaml:52),
  * per-instance rigid motion `bbox_tsfm` via Kabsch on box corners across
    frames (waymo.py:99-133) — motion defined on *ego-compensated* points,
    anchor frame = identity,
  * raw per-frame sensor coords stored by reversing the ego compensation
    (nuscene.py:198-203).

Everything is plain numpy (runs offline, not in the training loop — the
reference's numba kernels at toolbox/bbox_utils.py are host-only too).
"""

from __future__ import annotations

import numpy as np


def quat_wxyz_to_matrix(q) -> np.ndarray:
    """Unit quaternion [w, x, y, z] -> [3, 3] rotation matrix (replaces
    the pyquaternion dependency of the devkit path)."""
    w, x, y, z = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_wxyz_yaw(q) -> float:
    """Yaw (rotation about +z) of a [w, x, y, z] quaternion."""
    m = quat_wxyz_to_matrix(q)
    return float(np.arctan2(m[1, 0], m[0, 0]))


def pose_matrix(translation, rotation) -> np.ndarray:
    """[4, 4] rigid transform from a translation and a rotation given as
    either a [3, 3] matrix or a [w, x, y, z] quaternion."""
    rotation = np.asarray(rotation, np.float64)
    m = np.eye(4)
    m[:3, :3] = rotation if rotation.shape == (3, 3) else quat_wxyz_to_matrix(rotation)
    m[:3, 3] = translation
    return m


def yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def box_corners(box7: np.ndarray) -> np.ndarray:
    """[x, y, z, dx, dy, dz, yaw] -> [8, 3] corner coordinates."""
    centre, dims, yaw = box7[:3], box7[3:6], box7[6]
    signs = np.array(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sz in (-0.5, 0.5)]
    )
    local = signs * dims
    return (yaw_matrix(yaw) @ local.T).T + centre


def points_in_box(points: np.ndarray, box7: np.ndarray, margin: float = 0.0) -> np.ndarray:
    """Boolean mask of points inside an oriented box (points-in-rbbox,
    toolbox/bbox_utils.py equivalent)."""
    centre, dims, yaw = box7[:3], box7[3:6], box7[6]
    local = (points - centre) @ yaw_matrix(yaw)  # world -> box frame
    half = dims / 2.0 + margin
    return np.all(np.abs(local) <= half, axis=1)


def assign_instance_ids(points: np.ndarray, boxes: np.ndarray,
                        margin: float = 0.0) -> np.ndarray:
    """points [N,3], boxes [K,7] -> [N] int ids, 0 = no box, 1..K = box."""
    ids = np.zeros(len(points), np.int32)
    for k in range(len(boxes)):
        mask = points_in_box(points, boxes[k], margin)
        ids[mask & (ids == 0)] = k + 1
    return ids


def instance_motion_from_boxes(
    boxes: np.ndarray, box_valid: np.ndarray
) -> np.ndarray:
    """Per-instance rigid motion from tracked boxes (waymo.py:99-133).

    boxes [K, T, 7] in ego-compensated (anchor frame 0) coordinates,
    box_valid [K, T] bool. Returns bbox_tsfm [K+1, T, 4, 4]: index 0 is the
    background identity; tsfm[k+1, t] maps the instance's frame-t points to
    their frame-0 (or earliest valid frame) pose. Missing observations get
    the identity.
    """
    k_count, t_count = boxes.shape[:2]
    out = np.tile(np.eye(4, dtype=np.float32), (k_count + 1, t_count, 1, 1))
    for k in range(k_count):
        valid_ts = np.where(box_valid[k])[0]
        if len(valid_ts) == 0:
            continue
        anchor_t = valid_ts[0]
        anchor_corners = box_corners(boxes[k, anchor_t])
        for t in valid_ts:
            corners_t = box_corners(boxes[k, t])
            # Kabsch: corners_t -> anchor_corners
            mu_s, mu_t = corners_t.mean(0), anchor_corners.mean(0)
            cov = (corners_t - mu_s).T @ (anchor_corners - mu_t)
            u, _, vt = np.linalg.svd(cov)
            d = np.sign(np.linalg.det(vt.T @ u.T))
            rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
            trans = mu_t - rot @ mu_s
            out[k + 1, t, :3, :3] = rot
            out[k + 1, t, :3, 3] = trans
    return out


def instance_speeds(boxes: np.ndarray, box_valid: np.ndarray, dt: float) -> np.ndarray:
    """Max centre speed (m/s) per instance over consecutive valid frames."""
    k_count = boxes.shape[0]
    speeds = np.zeros(k_count)
    for k in range(k_count):
        ts = np.where(box_valid[k])[0]
        for a, b in zip(ts[:-1], ts[1:]):
            v = np.linalg.norm(boxes[k, b, :2] - boxes[k, a, :2]) / ((b - a) * dt)
            speeds[k] = max(speeds[k], v)
    return speeds


def build_sample(
    frame_points: list[np.ndarray],
    ego_motion_gt: np.ndarray,
    boxes: np.ndarray,
    box_valid: np.ndarray,
    foreground: np.ndarray,
    freq: float,
    speed_threshold: float = 0.5,
    sem_labels_per_frame: list[np.ndarray] | None = None,
) -> dict:
    """Assemble the runtime `.npz` contract (libs/dataset.py:24-41).

    Args:
      frame_points: T arrays [n_t, 3] in *ego-compensated* (anchor frame 0)
        coordinates — the natural output of devkit extraction.
      ego_motion_gt: [T, 4, 4], frame t sensor coords -> anchor coords.
      boxes: [K, T, 7] tracked boxes, ego-compensated coords.
      box_valid: [K, T] bool.
      foreground: [K] bool — which instances count as foreground.
      freq: sensor frequency (Hz).
    """
    t_count = len(frame_points)
    bbox_tsfm = instance_motion_from_boxes(boxes, box_valid)
    speeds = instance_speeds(boxes, box_valid, 1.0 / freq)

    pts_list, tid_list, inst_list, sem_list = [], [], [], []
    for t in range(t_count):
        pts = np.asarray(frame_points[t], np.float64)
        box_t = boxes[:, t]
        ids = np.zeros(len(pts), np.int32)
        for k in np.argsort(-np.prod(boxes[:, t, 3:6], axis=1)):  # big first
            if box_valid[k, t]:
                mask = points_in_box(pts, box_t[k])
                ids[mask] = k + 1
        # store raw per-frame sensor coords: reverse the ego compensation
        inv = np.linalg.inv(ego_motion_gt[t])
        raw = (inv[:3, :3] @ pts.T).T + inv[:3, 3]
        pts_list.append(raw.astype(np.float32))
        tid_list.append(np.full(len(pts), t, np.int32))
        inst_list.append(ids)
        if sem_labels_per_frame is not None:
            sem_list.append(np.asarray(sem_labels_per_frame[t], np.int32))

    inst_labels = np.concatenate(inst_list)
    fb_per_inst = np.concatenate([[False], np.asarray(foreground, bool)])
    sd_per_inst = np.concatenate([[False], speeds > speed_threshold]) & fb_per_inst

    return {
        "raw_points": np.concatenate(pts_list),
        "time_indice": np.concatenate(tid_list),
        "sd_labels": sd_per_inst[inst_labels].astype(np.int32),
        "fb_labels": fb_per_inst[inst_labels].astype(np.int32),
        "inst_labels": inst_labels,
        "sem_labels": (
            np.concatenate(sem_list) if sem_list
            else np.zeros_like(inst_labels)
        ),
        "ego_motion_gt": ego_motion_gt.astype(np.float32),
        "bbox_tsfm": bbox_tsfm.astype(np.float32),
    }
