"""Re-execution harness for the reference PyTorch MotionNet.

Installs pure-torch / numpy stand-ins for the reference's unavailable
native dependencies (torch_scatter, open3d, torchsparse, the CUDA chamfer
extension) into sys.modules, then imports the ACTUAL reference modules
from /root/reference, so the composed parity test
(tests/test_full_parity.py) runs the reference's own forward code —
models/motionnet.py:137-262 and everything below it — not a re-write.

Two deliberate deviations from the reference, both documented here and in
the test:

1. `warp_feats` anchor slot. The reference's warp loop leaks its loop
   variable: motionnet.py:111 concatenates `bev_feats[batch_idx,
   frame_idx:frame_idx+1]` where `frame_idx == T-1` after the
   `range(1, T)` loop, so the anchor slot of the warped stack holds the
   LAST frame's features instead of frame 0's. Our rebuild implements the
   evident intent (anchor frame unwarped in slot 0 — the slot the
   temporal max consumes alongside warped frames 1..T-1), so the harness
   re-binds a fixed `warp_feats` that uses frame 0. Everything else in
   the method is the reference's code path (inverse pose grid +
   grid_sample bilinear/zeros).

2. Keypoint sampling is made deterministic by configuration, not by
   patching: the parity config keeps every frame's background-pillar
   count <= n_kpts, where the reference's own draw degenerates to
   "arange + last-point fill" (egomotion.py:158-166) — byte-identical to
   our `deterministic_sampling` mode (models/egomotion.py).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch


def _install_stubs():
    if "torch_scatter" in sys.modules:
        return

    # ---- torch_scatter: composite scatter via torch.scatter_reduce ----
    ts = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
        assert dim == 0 and out is None, "reference only uses dim=0"
        index = index.long().view(-1)
        if dim_size is None:
            dim_size = int(index.max()) + 1 if index.numel() else 0
        shape = (dim_size,) + tuple(src.shape[1:])
        base = torch.zeros(shape, dtype=src.dtype, device=src.device)
        idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        red = {"sum": "sum", "add": "sum", "mean": "mean", "max": "amax",
               "min": "amin"}[reduce]
        # include_self=False == torch_scatter semantics: empty segments
        # keep the zero init, non-empty segments reduce only real rows
        return base.scatter_reduce(0, idx, src, reduce=red,
                                   include_self=False)

    ts.scatter = scatter
    sys.modules["torch_scatter"] = ts

    # ---- open3d: import-time placeholder (ICP paths are config-off) ----
    o3d = types.ModuleType("open3d")

    class _Unavailable:
        def __getattr__(self, name):
            raise RuntimeError("open3d stub: ICP paths must stay disabled")

    o3d.geometry = _Unavailable()
    o3d.utility = _Unavailable()
    o3d.pipelines = _Unavailable()
    o3d.io = _Unavailable()
    o3d.visualization = _Unavailable()
    sys.modules["open3d"] = o3d

    # ---- torchsparse.utils.quantize.sparse_quantize via np.unique ----
    tsp = types.ModuleType("torchsparse")
    tsp_utils = types.ModuleType("torchsparse.utils")
    tsp_quant = types.ModuleType("torchsparse.utils.quantize")

    def sparse_quantize(coords, return_index=False, return_inverse=False):
        coords = np.asarray(coords)
        uniq, index, inverse = np.unique(
            coords, axis=0, return_index=True, return_inverse=True
        )
        outs = [uniq]
        if return_index:
            outs.append(index)
        if return_inverse:
            outs.append(inverse.reshape(-1))
        return tuple(outs) if len(outs) > 1 else outs[0]

    tsp_quant.sparse_quantize = sparse_quantize
    tsp_utils.quantize = tsp_quant
    tsp.utils = tsp_utils
    sys.modules["torchsparse"] = tsp
    sys.modules["torchsparse.utils"] = tsp_utils
    sys.modules["torchsparse.utils.quantize"] = tsp_quant

    # ---- chamfer_distance: the CUDA ext (never called in forward) ----
    cd_pkg = types.ModuleType("chamfer_distance")
    cd_mod = types.ModuleType("chamfer_distance.chamfer_distance")

    class ChamferDistance(torch.nn.Module):
        def forward(self, *a, **k):  # pragma: no cover
            raise RuntimeError(
                "chamfer stub: get_alignment_errors is never on the "
                "reference forward path (tpointnet.py:145 has no caller)"
            )

    cd_mod.ChamferDistance = ChamferDistance
    cd_pkg.chamfer_distance = cd_mod
    sys.modules["chamfer_distance"] = cd_pkg
    sys.modules["chamfer_distance.chamfer_distance"] = cd_mod


def load_reference_motionnet():
    """Import the reference models package; returns its motionnet module."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.motionnet as ref_motionnet  # noqa: delayed import

    return ref_motionnet


def load_reference_fuseloss():
    """Import the reference FuseLoss class (libs/loss.py:52-320) with the
    same stand-ins; its ctor needs the loss-weight dict plus a 'save_dir'
    (toolbox/cluster_eval.py:30 opens cluster_eval.txt there)."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from libs.loss import FuseLoss  # noqa: delayed import

    return FuseLoss


def fixed_warp_feats(self, bev_feats, pose_estimation):
    """Reference warp_feats (motionnet.py:82-114) with the anchor slot
    fixed to frame 0 (deviation #1 in the module docstring)."""
    import torch.nn.functional as F

    B, T, C, Ny, Nx = bev_feats.size()
    updated_feats = []
    for batch_idx in range(B):
        grids = []
        for frame_idx in range(1, T):
            c_pose_inv = torch.linalg.inv(pose_estimation[batch_idx, frame_idx])
            grids.append(self.get_transformed_grid(
                c_pose_inv, Ny, Nx, self.resolution[0], self.resolution[1],
                self.pc_range[0], self.pc_range[1],
            ))
        grids = torch.stack(grids).permute(0, 2, 3, 1)
        sampled = F.grid_sample(
            bev_feats[batch_idx, 1:], grids, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
        updated_feats.append(
            torch.cat((bev_feats[batch_idx, 0:1], sampled), dim=0)
        )
    return torch.stack(updated_feats)


def ref_config(cfg: dict, mode: str = "val") -> dict:
    """Our (derived) config dict -> the reference's expected cfg schema."""
    vg = cfg["voxel_generator"]
    return {
        "pillar_encoder": {
            "depth": cfg["pillar_encoder"]["depth"],
            "num_input_features": 9,
            "num_filters": cfg["pillar_encoder"]["num_filters"],
            "voxel_size": vg["voxel_size"],
            "pc_range": vg["range"],
            "n_sweeps": vg["n_sweeps"],
        },
        "unet": {
            "in_channels": cfg["unet"]["in_channels"],
            "depth": cfg["unet"]["depth"],
            "start_filts": cfg["unet"]["start_filts"],
            "merge_mode": "concat",
        },
        "pose_estimation": {
            "feats_dim": cfg["pose_estimation"]["feats_dim"],
            "add_slack": cfg["pose_estimation"]["add_slack"],
            "sinkhorn_iter": cfg["pose_estimation"]["sinkhorn_iter"],
            "n_kpts": cfg["pose_estimation"]["n_kpts"],
            "icp_threshold": 0.15,
            "icp_max_iter": 50,
            "seq_pose": cfg["pose_estimation"]["seq_pose"],
        },
        "data": {
            "freq": cfg["data"]["freq"],
            "max_speed": cfg["data"]["max_speed"],
            "dataset": "nuscene",
        },
        "voxel_generator": {
            "n_sweeps": vg["n_sweeps"],
            "voxel_size": vg["voxel_size"],
            "range": vg["range"],
        },
        "model": {"ego_icp": False, "tpointnet_icp": False},
        "stpn": {"feat_dim": cfg["stpn"]["feat_dim"]},
        "misc": {"mode": mode},
        "cluster": {
            "min_p_cluster": cfg["cluster"]["min_p_cluster"],
            "min_samples_dbscan": cfg["cluster"]["min_samples_dbscan"],
            "eps_dbscan": cfg["cluster"]["eps_dbscan"],
            "voxel_size": cfg["cluster"]["voxel_size"],
            "cluster_metric": "euclidean",
        },
        "tpointnet": {
            "min_points": cfg["tpointnet"]["min_points"],
            "n_iterations": cfg["tpointnet"]["n_iterations"],
            "icp_threshold": 0.25,
        },
    }


def build_input_dict(batch: dict, cfg: dict) -> dict:
    """Our padded static-shape batch -> the reference's ragged input_dict
    (contract at motionnet.py:137-156 + libs/dataloader.py:7-40)."""
    vg = cfg["voxel_generator"]
    grid = np.round(
        (np.asarray(vg["range"][3:]) - np.asarray(vg["range"][:3]))
        / np.asarray(vg["voxel_size"])
    ).astype(int)
    nx, ny = int(grid[0]), int(grid[1])
    T = vg["n_sweeps"]
    B = batch["points"].shape[0]
    max_pillars = batch["pillar_valid"].shape[1]

    pts, tind, fb, sd, inst, p2v_all, coords_all = [], [], [], [], [], [], []
    num_voxels, inst_motion = [], []
    offset = 0
    for b in range(B):
        valid = np.asarray(batch["point_valid"][b])
        p2v = np.asarray(batch["pillar_of_point"][b])[valid]
        assert p2v.max(initial=-1) < max_pillars, "overflow pillars in parity scene"
        pts.append(np.asarray(batch["points"][b], np.float32)[valid])
        t = np.asarray(batch["time_idx"][b])[valid]
        tind.append(np.stack([np.full(t.shape, b, np.int64), t], axis=1))
        fb.append(np.asarray(batch["fb_labels"][b])[valid])
        sd.append(np.asarray(batch["sd_labels"][b])[valid])
        inst.append(np.asarray(batch["inst_labels"][b])[valid])
        p2v_all.append(p2v.astype(np.int64) + offset)

        pv = np.asarray(batch["pillar_valid"][b])
        m_b = int(pv.sum())
        pc = np.asarray(batch["pillar_coords"][b])[:m_b]  # (t, y, x)
        coords = np.zeros((m_b, 5), np.int64)
        coords[:, 0] = b
        coords[:, 2] = pc[:, 1]
        coords[:, 3] = pc[:, 2]
        coords[:, 4] = pc[:, 0]
        coords_all.append(coords)
        num_voxels.append(m_b)
        offset += m_b

        k_b = int(np.asarray(batch["inst_valid"][b]).sum())
        inst_motion.append(
            torch.tensor(np.asarray(batch["inst_motion_gt"][b])[:k_b],
                         dtype=torch.float32)
        )

    tt = torch.tensor
    return {
        "input_points": tt(np.concatenate(pts), dtype=torch.float32),
        "time_indice": tt(np.concatenate(tind)),
        "fb_labels": tt(np.concatenate(fb))[:, None].long(),
        "sd_labels": tt(np.concatenate(sd))[:, None].long(),
        "inst_labels": tt(np.concatenate(inst))[:, None].long(),
        "point_to_voxel_map": tt(np.concatenate(p2v_all))[:, None],
        "coordinates": tt(np.concatenate(coords_all)),
        "num_voxels": tt(np.asarray(num_voxels, np.int64)),
        "shape": tt(np.asarray([[nx, ny, 1, T]] * B)),
        "ego_motion_gt": tt(np.asarray(batch["ego_motion_gt"], np.float32)),
        "inst_motion_gt": inst_motion,
    }


def flatten_ours(batch: dict, arr) -> np.ndarray:
    """Select our padded per-point rows [B, N, ...] in the reference's flat
    concatenation order (valid rows, batch-major)."""
    out = []
    for b in range(batch["points"].shape[0]):
        valid = np.asarray(batch["point_valid"][b])
        out.append(np.asarray(arr[b])[valid])
    return np.concatenate(out)
