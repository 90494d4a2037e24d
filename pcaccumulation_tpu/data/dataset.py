"""Dataset: npz samples -> augmented, cropped, voxelised, padded tensors.

Host-side equivalent of the reference's libs/dataset.py:92-224 with the
same semantics (augmentation + pose conjugation, xy/z crop, ground removal
by height, 4D voxelisation) but emitting static-shape padded arrays
(see voxelizer.pad_sample) instead of ragged tensors.
"""

from __future__ import annotations

import os

import numpy as np

from pcaccumulation_tpu.data.voxelizer import pad_sample, voxelize


def _random_aug_tsfm(rng, rot_aug, shift_range):
    """Random SE(2) augmentation transform (dataset.py:106-116)."""
    yaw = rng.uniform(0, np.pi * rot_aug)
    c, s = np.cos(yaw), np.sin(yaw)
    tsfm = np.eye(4)
    tsfm[:2, :2] = [[c, -s], [s, c]]
    tsfm[0, 3] = rng.uniform(-shift_range, shift_range)
    tsfm[1, 3] = rng.uniform(-shift_range, shift_range)
    return tsfm


def prep_sample(
    data: dict,
    cfg: dict,
    augment: bool = False,
    rng: np.random.Generator | None = None,
    with_labels: bool = True,
) -> dict:
    """Full per-sample preprocessing (reference prep_input, dataset.py:147-204).

    with_labels=False skips the per-point label channels entirely and
    emits zeros in their slots — the inference path (serve.Predictor)
    feeds neutral zero labels anyway, and the label gathers are a
    measurable share of the single-core host prep (tools/PROFILE_r12.md).
    Output keys/shapes are identical either way."""
    rng = rng or np.random.default_rng()
    vg = cfg["voxel_generator"]
    cap = cfg["capacity"]
    aug_cfg = cfg["data_aug"]

    points = np.asarray(data["raw_points"], np.float32)
    time_idx = np.asarray(data["time_indice"]).astype(np.int32)
    if with_labels:
        sd = np.asarray(data["sd_labels"]).astype(np.int32)
        fb = np.asarray(data["fb_labels"]).astype(np.int32)
        inst = np.asarray(data["inst_labels"]).astype(np.int32)
        sem = np.asarray(
            data.get("sem_labels", np.zeros_like(sd))).astype(np.int32)
    ego_gt = np.asarray(data["ego_motion_gt"], np.float32)
    inst_gt = np.asarray(data["bbox_tsfm"], np.float32)

    # 1. augmentation + GT pose conjugation (dataset.py:118-138, 163-167)
    if augment:
        tsfm = _random_aug_tsfm(rng, aug_cfg["rot_aug"], aug_cfg["augment_shift_range"])
        # keep the whole host pipeline in f32: f64 noise/transforms used to
        # silently promote every downstream array (2x memory + slower RNG)
        t32 = tsfm.astype(np.float32)
        points = (t32[:3, :3] @ points.T).T + t32[:3, 3]
        noise = rng.random(points.shape, dtype=np.float32) - np.float32(0.5)
        points += noise * np.float32(aug_cfg["augment_noise"])
        scale = rng.uniform(aug_cfg["augment_scale_min"], aug_cfg["augment_scale_max"])
        points *= np.float32(scale)
        inv = np.linalg.inv(tsfm)
        ego_gt = (tsfm[None] @ ego_gt @ inv[None]).astype(np.float32)
        flat = inst_gt.reshape(-1, 4, 4)
        inst_gt = (tsfm[None] @ flat @ inv[None]).reshape(inst_gt.shape).astype(np.float32)

    # 2. crop (dataset.py:170-176)
    crop_xy, crop_z_min, crop_z_max = vg["crop_range"]
    sel = (
        (np.abs(points[:, 0]) < crop_xy)
        & (np.abs(points[:, 1]) < crop_xy)
        & (points[:, 2] > crop_z_min)
        & (points[:, 2] < crop_z_max)
    )

    # 3. ground removal by height (dataset.py:179-183)
    if cfg["data"]["remove_ground"]:
        ground_h = cfg["data"]["ground_height"] + cfg["data"]["ground_slack"]
        sel &= points[:, 2] > ground_h

    sel_idx = np.flatnonzero(sel)
    points, time_idx = points[sel_idx], time_idx[sel_idx]

    # 4. voxelise at fixed capacity
    pillar_coords, pillar_valid, pillar_of_point, in_range = voxelize(
        points, time_idx, vg["voxel_size"], vg["range"], vg["n_sweeps"],
        cap["max_pillars"],
    )

    # 5. sort points by pillar id. Point order is arbitrary to the model
    # (everything is masked segment ops), but sorted pillar ids let the
    # device use indices_are_sorted=True segment reductions — measured
    # ~2x faster on TPU. Invalid/overflow ids sort last. Within-pillar
    # order is irrelevant, so any sort works: the native stable counting
    # sort (O(n), ~5x np.argsort at 120k rows) when the library is built,
    # np.argsort otherwise.
    from pcaccumulation_tpu.native.host import native_sort_by_key

    order = native_sort_by_key(pillar_of_point, cap["max_pillars"])
    if order is None:
        order = np.argsort(pillar_of_point)
    points, time_idx = points[order], time_idx[order]
    pillar_of_point, in_range = pillar_of_point[order], in_range[order]
    if with_labels:
        # crop-select and pillar-sort composed into ONE gather per label
        # channel (the two-round form cost ~2x on 100k+ rows)
        final_idx = sel_idx[order]
        sd, fb = sd[final_idx], fb[final_idx]
        inst, sem = inst[final_idx], sem[final_idx]
    else:
        # one allocation aliased four ways on purpose (serving batches
        # never mutate labels); read-only so any future in-place write
        # fails loudly instead of corrupting all four channels
        zeros = np.zeros(order.shape[0], np.int32)
        zeros.setflags(write=False)
        sd = fb = inst = sem = zeros

    sample = {
        "points": points,
        "time_idx": time_idx,
        "sd_labels": sd,
        "fb_labels": fb,
        "inst_labels": inst,
        "sem_labels": sem,
        "ego_motion_gt": ego_gt,
        "inst_motion_gt": inst_gt,
        "pillar_coords": pillar_coords,
        "pillar_valid": pillar_valid,
        "pillar_of_point": pillar_of_point,
        "point_valid": in_range & (pillar_of_point < cap["max_pillars"]),
    }
    return pad_sample(sample, cap["max_points"], cap["max_instances"])


class SceneDataset:
    """File-list dataset over preprocessed .npz samples.

    Mirrors NuSceneDataset / WaymoDataset (libs/dataset.py:226-238): an
    info file of relative paths, optional per-scene filtering for test mode
    (scene name = first directory component).
    """

    def __init__(self, cfg: dict, split: str, augment: bool | None = None,
                 scene_name: str | None = None, base_dir: str | None = None):
        self.cfg = cfg
        self.base = base_dir or cfg["path"]["dataset_base"]
        self.augment = augment if augment is not None else (split == "train")
        info_path = os.path.join(self.base, f"{split}_info.txt")
        with open(info_path) as f:
            self.infos = [line.strip() for line in f if line.strip()]
        if scene_name is not None:
            self.infos = [p for p in self.infos if p.split(os.sep)[0] == scene_name]

    def scenes(self) -> list[str]:
        return sorted({p.split(os.sep)[0] for p in self.infos})

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, idx: int) -> dict:
        data = np.load(os.path.join(self.base, self.infos[idx]), allow_pickle=True)
        # SFC64: ~4.6x faster f32 generation than PCG64 for the aug noise
        rng = np.random.Generator(np.random.SFC64())
        return prep_sample(dict(data), self.cfg, augment=self.augment, rng=rng)
