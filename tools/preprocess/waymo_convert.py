"""Waymo Open Dataset -> training `.npz` converter.

    python tools/preprocess/waymo_convert.py <tfrecord_dir> <out_dir> \
        [--n-sweeps 5]

Rebuilds the reference's dataset_toolbox/waymo path (SURVEY.md §2.3,
waymo/converter.py + prep_nuscene_waymo_sf/waymo.py): decode range images
to cartesian points, transform a window of n_sweeps frames into the last
frame's vehicle frame, track labelled boxes by object id, and emit the
runtime contract via tools/preprocess/core.build_sample (instance motion =
Kabsch on box corners, waymo.py:99-133; sd label from object speed,
waymo.py:104). Requires `waymo-open-dataset` + tensorflow (not bundled in
this image — the converter degrades to a clear error).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import deque

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.preprocess import core  # noqa: E402


def assemble_window(window: list[tuple]):
    """Pure frame-window assembly + box association (fixture-testable).

    window: list of (pts_vehicle [N, 3], pose_global_from_vehicle [4, 4],
    labels: dict object_id -> (centre [3], lwh [3], heading)) with the
    OLDEST frame first (= anchor frame 0 of the contract).
    Returns (frame_points in anchor coords, ego [T, 4, 4],
    boxes [K, T, 7], valid [K, T], ids sorted list).
    """
    n_sweeps = len(window)
    anchor_from_global = np.linalg.inv(window[0][1])
    frame_points, ego_list = [], []
    ids = sorted({i for _, _, ls in window for i in ls})
    boxes = np.zeros((len(ids), n_sweeps, 7))
    valid = np.zeros((len(ids), n_sweeps), bool)
    for t, (pts, pose_t, labels_t) in enumerate(window):
        ego = anchor_from_global @ pose_t  # vehicle t -> anchor
        pts = np.asarray(pts, np.float64)
        frame_points.append((ego[:3, :3] @ pts.T).T + ego[:3, 3])
        ego_list.append(ego)
        for i, oid in enumerate(ids):
            lab = labels_t.get(oid)
            if lab is None:
                continue
            centre, lwh, heading = lab
            c_a = ego[:3, :3] @ np.asarray(centre, np.float64) + ego[:3, 3]
            yaw = heading + np.arctan2(ego[1, 0], ego[0, 0])
            boxes[i, t] = [*c_a, *lwh, yaw]
            valid[i, t] = True
    return frame_points, np.stack(ego_list), boxes, valid, ids


def convert_file(path: str, out_dir: str, n_sweeps: int,
                 freq: float) -> list[str]:
    """Convert one TFRecord segment; returns the emitted rel paths.
    The per-file unit of work — also the unit of host parallelism
    (reference: multiprocessing over segments,
    dataset_toolbox/waymo/preprocess.py:61-74)."""
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    scene = os.path.splitext(os.path.basename(path))[0]
    scene_dir = os.path.join(out_dir, scene)
    os.makedirs(scene_dir, exist_ok=True)
    window: deque = deque(maxlen=n_sweeps)
    infos = []

    for rec_idx, record in enumerate(tf.data.TFRecordDataset(path)):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(record.numpy())

        # points in vehicle frame
        (range_images, camera_projections, _, range_image_top_pose) = (
            frame_utils.parse_range_image_and_camera_projection(frame)
        )
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose
        )
        pts_vehicle = np.concatenate(points)

        pose = np.array(frame.pose.transform).reshape(4, 4)  # global<-veh
        labels = {
            l.id: (
                [l.box.center_x, l.box.center_y, l.box.center_z],
                [l.box.length, l.box.width, l.box.height],
                l.box.heading,
            )
            for l in frame.laser_labels
            if l.type != l.TYPE_SIGN  # fb label = label != sign (waymo.py)
        }
        window.append((pts_vehicle, pose, labels))
        if len(window) < n_sweeps:
            continue

        # anchor = OLDEST frame of the window (frame 0 in the contract)
        frame_points, ego_motion, boxes, valid, ids = assemble_window(
            list(window)
        )
        data = core.build_sample(
            frame_points, ego_motion, boxes, valid,
            foreground=np.ones(len(ids), bool), freq=freq,
        )
        rel = os.path.join(scene, f"{rec_idx:05d}.npz")
        np.savez_compressed(os.path.join(out_dir, rel), **data)
        infos.append(rel)
    return infos


# fork-inherited per-pool constants (see nuscenes_convert._POOL_STATE).
# Fork is safe here ONLY because convert() keeps the parent TF-free in
# the workers>1 path — see the comment there.
_POOL_STATE: dict = {}


def _convert_file_worker(path):
    s = _POOL_STATE
    return convert_file(path, s["out_dir"], s["n_sweeps"], s["freq"])


def convert(tfrecord_dir: str, out_dir: str, n_sweeps: int,
            freq: float = 10.0, workers: int = 1):
    if workers <= 1:
        # probe the heavyweight deps up front for a clear message. ONLY
        # in the serial path: TensorFlow is not fork-safe, so the
        # parallel path below must fork BEFORE any parent-side TF import
        # (forked children inherit TF's mutexes/threadpools mid-state
        # and can deadlock); each worker imports TF itself inside
        # convert_file.
        try:
            import tensorflow  # noqa: F401
            from waymo_open_dataset import dataset_pb2  # noqa: F401
            from waymo_open_dataset.utils import frame_utils  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise SystemExit(
                "waymo-open-dataset-tf and tensorflow are required "
                f"(import failed: {e})"
            )

    files = sorted(glob.glob(os.path.join(tfrecord_dir, "*.tfrecord")))
    os.makedirs(out_dir, exist_ok=True)
    infos = []

    if workers > 1:
        # segment-level host parallelism, like the reference's Pool over
        # tfrecords (dataset_toolbox/waymo/preprocess.py:61-74)
        import multiprocessing as mp

        _POOL_STATE.update(out_dir=out_dir, n_sweeps=n_sweeps, freq=freq)
        try:
            ctx = mp.get_context("fork")  # TF-clean parent: fork is safe
            with ctx.Pool(workers) as pool:
                for rels in pool.imap(_convert_file_worker, files):
                    infos.extend(rels)
        except ImportError as e:  # a worker's TF import failed
            raise SystemExit(
                "waymo-open-dataset-tf and tensorflow are required "
                f"(worker import failed: {e})"
            )
        finally:
            _POOL_STATE.clear()
    else:
        for path in files:
            infos.extend(convert_file(path, out_dir, n_sweeps, freq))

    with open(os.path.join(out_dir, "all_info.txt"), "w") as f:
        f.write("\n".join(infos) + "\n")
    print(f"wrote {len(infos)} samples")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tfrecord_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--n-sweeps", type=int, default=5)
    ap.add_argument("--workers", type=int, default=1,
                    help="segment-parallel worker processes")
    args = ap.parse_args()
    convert(args.tfrecord_dir, args.out_dir, args.n_sweeps,
            workers=args.workers)
