"""nuScenes -> training `.npz` converter.

    python tools/preprocess/nuscenes_convert.py <nuscenes_root> <out_dir> \
        [--version v1.0-trainval] [--n-sweeps 11]

Rebuilds the reference's dataset_toolbox/nuscene path (SURVEY.md §2.3):
for every keyframe, collect the keyframe + (n_sweeps - 1) preceding sweeps,
transform them into the keyframe ego frame (ego compensation), associate
points with tracked boxes, and emit the runtime contract via
tools/preprocess/core.build_sample. Requires the `nuscenes-devkit`
(not bundled in this image — the converter degrades to a clear error).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.preprocess import core  # noqa: E402

FOREGROUND_CLASSES = (
    "vehicle.car", "vehicle.truck", "vehicle.bus", "vehicle.trailer",
    "vehicle.construction", "vehicle.motorcycle", "vehicle.bicycle",
    "human.pedestrian",
)


def transform_matrix(translation, rotation_quat_wxyz):
    return core.pose_matrix(translation, rotation_quat_wxyz)


def sweep_window_to_anchor(sweeps: list[dict]):
    """Pure sweep-window/ego-chain assembly (fixture-testable).

    sweeps: per sweep {"points": [N, 3] sensor coords,
    "global_from_sensor": [4, 4]}; sweeps[0] is the anchor keyframe.
    Returns (frame_points list in anchor coords, ego_motion [T, 4, 4]
    mapping each sweep's sensor coords to the anchor).
    """
    anchor_from_global = np.linalg.inv(sweeps[0]["global_from_sensor"])
    frame_points, ego_list = [], []
    for sw in sweeps:
        ego = anchor_from_global @ sw["global_from_sensor"]
        pts = np.asarray(sw["points"], np.float64)
        frame_points.append((ego[:3, :3] @ pts.T).T + ego[:3, 3])
        ego_list.append(ego)
    return frame_points, np.stack(ego_list)


def extrapolate_boxes(anns: list[dict], anchor_from_global, n_sweeps: int,
                      freq: float):
    """Pure keyframe-box extrapolation (nuscene.py:170-179 equivalent).

    anns: per annotation {"translation": [3] global, "yaw": float global,
    "size_wlh": [3], "velocity": [3], "foreground": bool}. Sweep t is
    t/freq seconds BEFORE the keyframe, so centres move backwards along
    the annotated velocity. Returns (boxes [K, T, 7] anchor coords,
    valid [K, T], foreground [K]).
    """
    k = len(anns)
    boxes = np.zeros((k, n_sweeps, 7))
    valid = np.zeros((k, n_sweeps), bool)
    fg = np.zeros(k, bool)
    yaw_a_off = np.arctan2(anchor_from_global[1, 0], anchor_from_global[0, 0])
    for i, ann in enumerate(anns):
        fg[i] = bool(ann["foreground"])
        vel = np.nan_to_num(np.asarray(ann["velocity"], np.float64))
        centre_g = np.asarray(ann["translation"], np.float64)
        size = ann["size_wlh"]
        for t in range(n_sweeps):
            c_g = centre_g - vel * (t / freq)
            c_a = anchor_from_global[:3, :3] @ c_g + anchor_from_global[:3, 3]
            boxes[i, t] = [*c_a, size[1], size[0], size[2],
                           ann["yaw"] + yaw_a_off]
            valid[i, t] = True
    return boxes, valid, fg


def convert_scene(nusc, nusc_root: str, out_dir: str, n_sweeps: int,
                  freq: float, scene: dict) -> list[str]:
    """Convert one scene's keyframe chain; returns the emitted rel paths.
    The per-scene unit of work — also the unit of host parallelism
    (reference: multiprocessing over scenes, toolbox/utils.py:27-31)."""
    from nuscenes.utils.data_classes import LidarPointCloud

    scene_dir = os.path.join(out_dir, scene["name"])
    os.makedirs(scene_dir, exist_ok=True)
    infos = []
    token = scene["first_sample_token"]
    sample_idx = 0
    while token:
        sample = nusc.get("sample", token)
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])

        # anchor (keyframe) global <- ego <- sensor transforms
        cal = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose0 = nusc.get("ego_pose", sd["ego_pose_token"])
        g_from_e0 = transform_matrix(pose0["translation"], pose0["rotation"])
        e_from_s0 = transform_matrix(cal["translation"], cal["rotation"])
        anchor_from_global = np.linalg.inv(g_from_e0 @ e_from_s0)

        sweeps = []
        cur = sd
        for t in range(n_sweeps):
            if cur is None:
                break
            pc = LidarPointCloud.from_file(
                os.path.join(nusc_root, cur["filename"])
            )
            cal_t = nusc.get("calibrated_sensor", cur["calibrated_sensor_token"])
            pose_t = nusc.get("ego_pose", cur["ego_pose_token"])
            g_from_s = (
                transform_matrix(pose_t["translation"], pose_t["rotation"])
                @ transform_matrix(cal_t["translation"], cal_t["rotation"])
            )
            sweeps.append(
                {"points": pc.points[:3].T, "global_from_sensor": g_from_s}
            )
            cur = (
                nusc.get("sample_data", cur["prev"]) if cur["prev"] else None
            )
        if len(sweeps) < n_sweeps:
            break
        frame_points, ego_motion = sweep_window_to_anchor(sweeps)

        # tracked boxes across the sweep window (keyframe annotations
        # propagated by instance token; nuScenes only annotates
        # keyframes, so box motion uses annotation velocity)
        boxes, valid, fg = collect_boxes(
            nusc, sample, anchor_from_global, n_sweeps, freq
        )

        data = core.build_sample(
            frame_points, ego_motion, boxes, valid, fg, freq
        )
        rel = os.path.join(scene["name"], f"{sample_idx:05d}.npz")
        np.savez_compressed(os.path.join(out_dir, rel), **data)
        infos.append(rel)
        sample_idx += 1
        token = sample["next"]
    return infos


# fork-inherited state for the worker pool: the loaded devkit object is
# large and not generally picklable, so workers inherit it via fork
# instead of receiving it through the task pipe
_POOL_STATE: dict = {}


def _convert_scene_worker(scene):
    s = _POOL_STATE
    return convert_scene(s["nusc"], s["nusc_root"], s["out_dir"],
                         s["n_sweeps"], s["freq"], scene)


def convert(nusc_root: str, out_dir: str, version: str, n_sweeps: int,
            freq: float = 20.0, workers: int = 1):
    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "nuscenes-devkit is required: pip install nuscenes-devkit "
            f"(import failed: {e})"
        )

    nusc = NuScenes(version=version, dataroot=nusc_root, verbose=True)
    os.makedirs(out_dir, exist_ok=True)
    infos = []

    scenes = list(nusc.scene)
    if workers > 1:
        # scene-level host parallelism, like the reference's
        # multiprocessing.Pool preprocessing (toolbox/utils.py:27-31)
        import multiprocessing as mp

        _POOL_STATE.update(nusc=nusc, nusc_root=nusc_root, out_dir=out_dir,
                           n_sweeps=n_sweeps, freq=freq)
        try:
            ctx = mp.get_context("fork")
            with ctx.Pool(workers) as pool:
                for rels in pool.imap(_convert_scene_worker, scenes):
                    infos.extend(rels)
        finally:
            _POOL_STATE.clear()
    else:
        for scene in scenes:
            infos.extend(
                convert_scene(nusc, nusc_root, out_dir, n_sweeps, freq, scene)
            )

    with open(os.path.join(out_dir, "all_info.txt"), "w") as f:
        f.write("\n".join(infos) + "\n")
    print(f"wrote {len(infos)} samples")


def collect_boxes(nusc, sample, anchor_from_global, n_sweeps, freq):
    """Devkit adapter: annotations -> plain dicts -> extrapolate_boxes."""
    anns = []
    for token in sample["anns"]:
        ann = nusc.get("sample_annotation", token)
        anns.append({
            "translation": ann["translation"],
            "yaw": core.quat_wxyz_yaw(ann["rotation"]),
            "size_wlh": ann["size"],
            "velocity": nusc.box_velocity(ann["token"]),
            "foreground": any(
                ann["category_name"].startswith(c) for c in FOREGROUND_CLASSES
            ),
        })
    return extrapolate_boxes(anns, anchor_from_global, n_sweeps, freq)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("nuscenes_root")
    ap.add_argument("out_dir")
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--n-sweeps", type=int, default=11)
    ap.add_argument("--workers", type=int, default=1,
                    help="scene-parallel worker processes")
    args = ap.parse_args()
    convert(args.nuscenes_root, args.out_dir, args.version, args.n_sweeps,
            workers=args.workers)
