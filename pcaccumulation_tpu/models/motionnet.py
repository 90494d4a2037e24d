"""MotionNet: the end-to-end orchestrator.

Re-implements the reference's models/motionnet.py:13-262 as one jittable
flax module over static-shape padded batches: pillar stats, BEV encoding,
UNet backbone, FB segmentation, ego-motion estimation, feature warping,
motion segmentation + offset voting, and per-instance reconstruction.

The reference's dynamic gates (`if fb_mask.sum() > MIN_POINTS`,
motionnet.py:222,243) become `jnp.where` selections on default outputs, so
the same graph covers every input.

Test-time clustering (motionnet.py:238, DBSCAN on CPU in the reference)
runs ON DEVICE inside this module in test mode (ops/cluster.py, called
below), so the whole test forward is one jitted program; callers that
cluster externally can inject labels via `inst_labels_override` instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.models.egomotion import EgoMotionHead
from pcaccumulation_tpu.models.layers import S2DSegHead2D, SegHead2D
from pcaccumulation_tpu.ops.s2d import depth_to_space
from pcaccumulation_tpu.models.pillar_encoder import (
    PillarFeatureNet,
    gather_bev_at_pillars,
    gather_packed_s2d_at_pillars,
    pillar_stats,
    scatter_pillars_to_bev,
    scatter_pillars_to_bev_gather,
)
from pcaccumulation_tpu.models.stpn import STPN
from pcaccumulation_tpu.models.tpointnet import AlignNet
from pcaccumulation_tpu.models.unet import UNet
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.bilinear import (
    temporal_ungrid,
    temporal_ungrid_folded,
    ungrid,
    warp_bev,
    warp_bev_folded,
)

MIN_POINTS = 15  # motionnet.py:11


class MotionNet(nn.Module):
    """cfg is the full (derived) config dict; treated as static."""

    cfg: dict

    def setup(self):
        cfg = self.cfg
        vg = cfg["voxel_generator"]
        pe = cfg["pillar_encoder"]
        self.grid_hw = (vg["grid_size"][1], vg["grid_size"][0])  # (H=ny, W=nx)
        self.n_frames = vg["n_sweeps"]
        self.pc_range = vg["range"]
        self.voxel_size = vg["voxel_size"]
        self.max_pillars = cfg["capacity"]["max_pillars"]
        dtype_name = cfg.get("precision", {}).get("compute_dtype", "float32")
        self.compute_dtype = None if dtype_name == "float32" else jnp.dtype(dtype_name)
        # frame-axis sequence parallelism (parallel/mesh.py FRAME_AXIS):
        # when the run's mesh has a `frame` axis, constrain the per-frame
        # backbone (canvas -> UNet -> heads) to shard over it; the post-UNet
        # fold all-gathers the frames for the temporal fusion. Constraints
        # use bare PartitionSpecs, so the step must trace under `with mesh:`
        # (trainer and tests do). SURVEY.md §2.4: the per-frame UNet is
        # embarrassingly parallel across T until the STPN fusion.
        self.shard_frames = (
            cfg.get("parallel", {}).get("frame_devices", 1) > 1
        )
        # spatial partitioning (parallel/mesh.py SPATIAL_AXIS): shard the
        # BEV row (H) axis through the same backbone — GSPMD inserts the
        # per-conv halo exchanges and the BN-statistics all-reduces; the
        # fold gathers the bands back with the frames. The conv-net
        # analogue of tensor parallelism (no reference counterpart —
        # SURVEY §2.4, single GPU).
        self.shard_spatial = (
            cfg.get("parallel", {}).get("spatial_devices", 1) > 1
        )
        # BEV densification: "scatter" (wide unique row scatter) or "gather"
        # (inverse-map row gather). "auto" resolves per call (train vs not):
        # in the VAL/TEST graph at T>=8 production grids XLA's channel-major
        # canvas layout turns the wide scatter into strided element writes
        # (5.56 ms traced at T=11, PROFILE_r07) while the gather form
        # streams (38.49 -> 36.74 ms in situ); the TRAIN graph's layout
        # assignment differs and the scatter wins there (62.53 vs 63.26 ms),
        # as it does at T=4 bench shapes (tools/profile_scatter_pack).
        self.densify_mode = cfg.get("perf", {}).get("densify", "auto")

        self.pillar_encoder = PillarFeatureNet(
            num_filters=pe["num_filters"],
            depth=pe["depth"],
            voxel_size=tuple(vg["voxel_size"]),
            pc_range=tuple(vg["range"]),
            n_sweeps=vg["n_sweeps"],
            dtype=self.compute_dtype,
        )
        # s2d level 0 is an exact reformulation (ops/s2d.py); active only
        # when the grid is even (always for the 288^2 / production grids)
        self.s2d_active = (
            cfg["unet"].get("s2d_level0", True)
            and cfg["unet"]["depth"] > 1
            and self.grid_hw[0] % 2 == 0 and self.grid_hw[1] % 2 == 0
        )
        self.unet = UNet(
            in_channels=cfg["unet"]["in_channels"],
            depth=cfg["unet"]["depth"],
            start_filts=cfg["unet"]["start_filts"],
            dtype=self.compute_dtype,
            keep_compute_dtype=True,
            s2d_level0=self.s2d_active,
            also_return_s2d=self.s2d_active,
        )
        # the heads consume the PRE-fold [B*T, H, W, C] UNet output: per-frame
        # convs measured 0.8+1.05 ms vs 1.41+2.72 ms for the block-diagonal
        # folded form (the zero blocks are real FLOPs at 256 channels) and
        # 2.1+3.1 ms for feature_group_count=T grouped convs on v5e.
        # The narrow FB head additionally runs in s2d layout with a packed
        # half-resolution output (S2DSegHead2D — identical params/math);
        # the wide (mid=64) ego head measured no s2d win and stays plain.
        fb_head_cls = S2DSegHead2D if self.s2d_active else SegHead2D
        self.semseg_head = fb_head_cls(
            2, dtype=self.compute_dtype, keep_compute_dtype=True,
            pad_narrow_out=self.compute_dtype is not None,
        )
        self.ego_feats_head = SegHead2D(
            cfg["pose_estimation"]["feats_dim"], dtype=self.compute_dtype,
            keep_compute_dtype=True,
        )
        self.ego_motion_head = EgoMotionHead(
            n_kpts=cfg["pose_estimation"]["n_kpts"],
            sinkhorn_iter=cfg["pose_estimation"]["sinkhorn_iter"],
            slack=cfg["pose_estimation"]["add_slack"],
            n_sweeps=vg["n_sweeps"],
            freq=cfg["data"]["freq"],
            max_speed=cfg["data"]["max_speed"],
            seq_pose=cfg["pose_estimation"]["seq_pose"],
            approx_sampling=cfg["pose_estimation"].get("approx_sampling", True),
            deterministic_sampling=cfg["pose_estimation"].get(
                "deterministic_sampling", False
            ),
            icp=cfg["pose_estimation"].get("icp", False),
            icp_threshold=cfg["pose_estimation"].get("icp_threshold", 0.15),
            icp_max_iter=cfg["pose_estimation"].get("icp_max_iter", 50),
        )
        self.motionhead = STPN(
            feat_dim=cfg["stpn"]["feat_dim"], n_frames=vg["n_sweeps"],
            dtype=self.compute_dtype,
            n_band_layers=cfg["stpn"].get("n_band_layers", 4),
        )
        self.reconstructor = AlignNet(
            n_frames=vg["n_sweeps"],
            n_iterations=cfg["tpointnet"]["n_iterations"],
            dtype=self.compute_dtype,
            min_points_per_frame=cfg["tpointnet"]["min_points"],
            icp=cfg["tpointnet"].get("icp", False),
            icp_threshold=cfg["tpointnet"].get("icp_threshold", 0.25),
            icp_max_iter=cfg["tpointnet"].get("icp_max_iter", 50),
            icp_max_points=cfg["tpointnet"].get("icp_max_points", 1024),
        )

    def __call__(self, batch: dict, train: bool = False, mode: str = "train",
                 inst_labels_override=None) -> dict:
        points = batch["points"].astype(jnp.float32)       # [B, N, 3]
        time_idx = batch["time_idx"]                       # [B, N]
        point_valid = batch["point_valid"]                 # [B, N]
        p2v = batch["pillar_of_point"]                     # [B, N]
        pillar_coords = batch["pillar_coords"]             # [B, M, 3]
        pillar_valid = batch["pillar_valid"]               # [B, M]
        fb_labels = batch["fb_labels"]                     # [B, N]
        ego_motion_gt = batch["ego_motion_gt"].astype(jnp.float32)

        b, n, _ = points.shape
        m = self.max_pillars
        t = self.n_frames
        h, w = self.grid_hw
        results = {}

        # ---- 1. pillar stats + GT canvases (motionnet.py:159-173) ---------
        # one fused segment pass: mean xyz + fb max (torch_scatter
        # mean/max at motionnet.py:159-160)
        pillar_mean, fb_pillar_gt = pillar_stats(
            points, fb_labels, point_valid, p2v, m
        )

        # ---- 2. pillar encoder -> BEV -> UNet (motionnet.py:177-184) ------
        pillar_feats = self.pillar_encoder(
            points, time_idx, point_valid, p2v, pillar_coords, pillar_mean, m
        )  # [B, M, C]
        c = pillar_feats.shape[-1]
        # ONE canvas scatter carries features + occupancy + fb GT as extra
        # channels (three separate scatters cost ~3.4 ms at bench shapes;
        # the scatter's fixed cost dominates its bandwidth)
        packed = jnp.concatenate(
            [
                pillar_feats,
                pillar_valid[..., None].astype(pillar_feats.dtype),
                fb_pillar_gt[..., None].astype(pillar_feats.dtype),
            ],
            axis=-1,
        )  # [B, M, C+2]
        # the densification runs in f32 for BOTH forms: a bf16 row scatter
        # measured 2.6x slower on v5e (sub-word writes), and a bf16 row
        # GATHER of the 34-lane rows measured 2.4 ms slower in situ at
        # T=11 (37.70 vs 35.25 ms, PROFILE_r08 — same sub-word access
        # penalty on the read side), so the compute-dtype hand-off happens
        # after the canvas is dense in either mode
        densify = self.densify_mode
        if densify == "auto":
            densify = "gather" if (self.n_frames >= 8 and not train) else "scatter"
        densify_fn = (
            scatter_pillars_to_bev_gather
            if densify == "gather"
            else scatter_pillars_to_bev
        )
        canvas = densify_fn(
            packed.astype(jnp.float32), pillar_coords, pillar_valid, t,
            self.grid_hw,
        )  # [B, T, H, W, C+2]
        # the constraints only trace when a mesh with the named axes is
        # ambient: inference entry points (Tester, serve) build the model
        # from a training run's saved config — parallel factors included —
        # without entering a mesh, and a bare-P constraint with no mesh
        # raises at trace time on jax 0.9
        shard_frames = shard_spatial = False
        if self.shard_frames or self.shard_spatial:
            from pcaccumulation_tpu.parallel.mesh import (
                DATA_AXIS,
                FRAME_AXIS,
                SPATIAL_AXIS,
                ambient_mesh_axes,
            )

            axes = ambient_mesh_axes()
            if DATA_AXIS in axes:
                shard_frames = self.shard_frames and FRAME_AXIS in axes
                shard_spatial = self.shard_spatial and SPATIAL_AXIS in axes
        if shard_frames or shard_spatial:
            from jax.sharding import PartitionSpec as P

            # [B*T] rows over data (and frame); H bands over spatial
            bt_spec = (DATA_AXIS, FRAME_AXIS) if shard_frames else DATA_AXIS
            sp_spec = SPATIAL_AXIS if shard_spatial else None

            def wsc_bt(x):  # [B*T, H, W, C] backbone activations
                return jax.lax.with_sharding_constraint(x, P(bt_spec, sp_spec))

            canvas = jax.lax.with_sharding_constraint(
                canvas,
                P(DATA_AXIS, FRAME_AXIS if shard_frames else None, sp_spec),
            )
        else:
            def wsc_bt(x):
                return x
        bev = canvas[..., :c]
        results["occ_map"] = jax.lax.stop_gradient(canvas[..., c:c + 1])
        results["fb_seg_gt"] = jax.lax.stop_gradient(canvas[..., c + 1:c + 2])
        if self.s2d_active:
            bev_feats, bev_feats_s2d = self.unet(
                wsc_bt(bev.reshape(b * t, h, w, c))
            )
            bev_feats, bev_feats_s2d = wsc_bt(bev_feats), wsc_bt(bev_feats_s2d)
        else:
            bev_feats = wsc_bt(self.unet(wsc_bt(bev.reshape(b * t, h, w, c))))
            bev_feats_s2d = None
        # [B*T, H, W, Cf] (+ the pre-d2s s2d view for the heads)
        cf = bev_feats.shape[-1]
        # FOLD to the canonical post-UNet layout [B, H, W, T*Cf], t-minor:
        # T*Cf = 128 = the TPU lane width. Every consumer below (heads,
        # warp, STPN, per-point ungrids) operates on this layout — per-frame
        # [B*T, H, W, 32] convs ran at <12 TF/s in T(4,128) tilings and the
        # pallas warp needed full-canvas layout copies before the fold
        # fold formulation: identical values, different HLO. "auto" =
        # lane-concat in the val/test graph once T*Cf exceeds the 128-lane
        # width (36.74 -> 36.07 ms at T=11, PROFILE_r07), else the
        # transpose (T=4 val measured 12.13 vs 12.25 ms; train neutral)
        fold_mode = self.cfg.get("perf", {}).get("fold", "auto")
        if fold_mode == "auto":
            fold_mode = (
                "concat" if (t * cf > 128 and not train) else "transpose"
            )
        if fold_mode == "concat":
            xr = bev_feats.reshape(b, t, h, w, cf)
            bevf = jnp.concatenate([xr[:, ti] for ti in range(t)], axis=-1)
        else:
            bevf = (
                bev_feats.reshape(b, t, h, w, cf)
                .transpose(0, 2, 3, 1, 4)
                .reshape(b, h, w, t * cf)
            )
        if shard_frames or shard_spatial:
            # the temporal fusion consumes every frame (and the warp every
            # row): XLA materialises the frame/band all-gather here;
            # downstream stays data-parallel
            bevf = jax.lax.with_sharding_constraint(bevf, P(DATA_AXIS))

        # ---- 3. FB segmentation (motionnet.py:188-194) ---------------------
        # logits stay in the compute dtype; the f32 full map exists only for
        # the losses (XLA prunes it when the caller drops fb_seg_est), and
        # the pillar decisions come from a [B, M, 2] gather + compare — the
        # full-map f32 argmax reduce alone profiled 0.68 ms at 288^2
        # fb_logits may be 128-wide (pad_narrow_out: channels 2.. are zero);
        # slicing happens on the tiny post-gather rows / the f32 results view
        if self.s2d_active:
            # packed half-res s2d logit map [B*T, H/2, W/2, 128] (8 real
            # channels = 4 sub-position blocks x 2 logits); the pillar
            # gather reads it directly, and the full-res map view below is
            # pruned by XLA whenever the caller drops fb_seg_est
            fb_packed = self.semseg_head(bev_feats_s2d, train=train)
            results["fb_seg_est"] = depth_to_space(
                fb_packed[..., :8]
            ).reshape(b, t, h, w, 2).astype(jnp.float32)
            fb_logit_pillar = gather_packed_s2d_at_pillars(
                fb_packed.reshape(b, t, h // 2, w // 2, -1),
                pillar_coords, pillar_valid, 2,
            )  # [B, M, 2]
        else:
            fb_logits = self.semseg_head(bev_feats, train=train)
            fb_logits = fb_logits.reshape(b, t, h, w, fb_logits.shape[-1])
            results["fb_seg_est"] = fb_logits[..., :2].astype(jnp.float32)
            fb_logit_pillar = gather_bev_at_pillars(
                fb_logits, pillar_coords, pillar_valid
            )  # [B, M, *]; invalid pillar rows are zero -> compare gives 0
        fb_est_pillar = (
            fb_logit_pillar[..., 1] > fb_logit_pillar[..., 0]
        ).astype(jnp.int32)  # [B, M]
        # the FB loss consumes these PILLAR-level rows, not the full map:
        # the reference's occupancy mask (loss.py:164-187) selects exactly
        # one cell per occupied pillar, so the row sets are identical — and
        # a [B, M, 2] gather avoids materializing the 64x lane-padded
        # [B, T, H, W, 2] f32 map in the training graph (its backward
        # reshape alone traced 16.6 ms at bench shapes)
        results["fb_logit_pillar"] = fb_logit_pillar[..., :2].astype(jnp.float32)
        results["fb_pillar_gt"] = jax.lax.stop_gradient(fb_pillar_gt)
        p2v_c = jnp.clip(p2v, 0, m - 1)
        fb_est_point = jnp.take_along_axis(fb_est_pillar, p2v_c, axis=1)
        fb_est_point = jnp.where(point_valid, fb_est_point, 0)
        results["fb_est_per_points"] = fb_est_point

        # ---- 4. ego motion (motionnet.py:198-201) --------------------------
        def _l2_normalize(f):
            # eps INSIDE the sqrt: invalid pillar rows are exactly zero
            # after the masked gather, and d||x||/dx at x=0 is NaN with
            # the (norm + eps) form — sqrt(sum + eps) has a zero gradient
            f = f.astype(jnp.float32)
            return f / jnp.sqrt(
                jnp.sum(jnp.square(f), axis=-1, keepdims=True) + 1e-12
            )

        sparse_ego = (
            self.s2d_active
            and self.cfg["pose_estimation"].get("sparse_eval", True)
        )
        if sparse_ego:
            # the graph only reads the ego-feature maps at the T*n_kpts
            # cells the head samples, so the dense conv pair + full-pillar
            # gather (1.3 ms traced at bench shapes; conv1's train VJP
            # alone 1.8 ms) collapse to an s2d conv0 + per-cell sparse
            # conv1 (SegHead2D centers path). Gradient-exact in train:
            # BN batch statistics still come from the full conv0 map.
            def ego_feats_fn(top_idx):  # [B, T, n] pillar indices
                flat_idx = top_idx.reshape(b, -1)  # [B, T*n]
                coords = jnp.take_along_axis(
                    pillar_coords, flat_idx[..., None], axis=1
                )  # [B, T*n, 3] = (t, y, x)
                bt_map = (
                    jnp.arange(b, dtype=jnp.int32)[:, None] * t
                    + jnp.clip(coords[..., 0], 0, t - 1)
                ).reshape(-1)
                yy = jnp.clip(coords[..., 1], 0, h - 1).reshape(-1)
                xx = jnp.clip(coords[..., 2], 0, w - 1).reshape(-1)
                feats = self.ego_feats_head(
                    None, train=train, x_s2d=bev_feats_s2d,
                    centers=(bt_map, yy, xx),
                )  # [B*T*n, C]
                return _l2_normalize(
                    feats.reshape(b, t, -1, feats.shape[-1])
                )

            ego_feats_pillar = None
        else:
            ego_feats = self.ego_feats_head(bev_feats, train=train)
            ego_feats_pillar = gather_bev_at_pillars(
                ego_feats.reshape(b, t, h, w, -1), pillar_coords, pillar_valid
            )  # [B, M, C]
            # L2-normalize AFTER the pillar gather: row-normalization
            # commutes with a row gather, and [B,M,C] is ~13x smaller than
            # the BEV map (the full-map div + its layout copy profiled
            # ~0.7 ms at 288^2); f32 from here on — Sinkhorn/Kabsch need
            # full precision
            ego_feats_pillar = _l2_normalize(ego_feats_pillar)
            ego_feats_fn = None
        ego = self.ego_motion_head(
            ego_feats_pillar,
            pillar_mean,
            pillar_coords[..., 0],
            pillar_valid,
            fb_est_pillar == 0,
            points,
            time_idx,
            point_valid,
            ego_motion_gt,
            point_bg=(fb_est_point == 0) & point_valid,
            feats_fn=ego_feats_fn,
            pillar_scan_key=pillar_coords[..., 1] * w + pillar_coords[..., 2],
        )
        results.update(ego)

        # ---- 5. warp + motion segmentation (motionnet.py:205-229) ----------
        pose_est = jax.lax.stop_gradient(results["ego_motion_est"])
        bev_detached = jax.lax.stop_gradient(bevf)
        # warp + per-point gathers run on the detached folded canvas in the
        # compute dtype (halves the row-shift kernel's DMA traffic)
        bev_gather = (
            bev_detached.astype(self.compute_dtype)
            if self.compute_dtype is not None else bev_detached
        )

        x_reso, y_reso = self.voxel_size[0], self.voxel_size[1]
        x_min, y_min = self.pc_range[0], self.pc_range[1]

        warp_method = self.cfg.get("warp_mode", "shear")

        # anchor frame stays unwarped (the reference warps x[1:] only);
        # pinning pose 0 to the exact identity makes its shear shifts ~0
        # (pass-through up to f32 residue), so ONE folded kernel call per
        # shear pass covers every frame
        poses_w = pose_est.at[:, 0].set(jnp.eye(4, dtype=pose_est.dtype))
        if warp_method == "gather":
            unfolded = (
                bev_gather.reshape(b, h, w, t, cf).transpose(0, 3, 1, 2, 4)
            )
            warped_tf = jax.vmap(jax.vmap(
                lambda fm, p: warp_bev(fm, p, x_reso, y_reso, x_min, y_min,
                                       method="gather")
            ))(unfolded, poses_w)
            warped = (
                warped_tf.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * cf)
            )
        else:
            warped = warp_bev_folded(
                bev_gather, poses_w, x_reso, y_reso, x_min, y_min
            )  # [B, H, W, T*Cf], compute dtype

        transformed_points = se3.ego_motion_compensation(points, time_idx, pose_est)
        results["transformed_points"] = transformed_points

        if mode in ("train", "val"):
            fb_mask = ((fb_labels == 1) | (fb_est_point == 1)) & point_valid
        else:
            fb_mask = (fb_est_point == 1) & point_valid

        gate = jnp.sum(fb_mask) > MIN_POINTS
        s_fb = self.cfg["capacity"].get("max_fg_points", 0) or n
        if s_fb < n:
            # decode MOS/offset on the FG subset only: the reference decodes
            # every point (stpn.py:91-103) but only FG points are ever
            # consumed (motionnet.py:222-229); gathering first cuts the
            # per-point ungrid + MLP + head work ~N/S-fold
            from pcaccumulation_tpu.ops.segment import (
                compact_mask_indices,
                take_rows_unique,
            )

            sel_fb, sel_fb_valid = compact_mask_indices(fb_mask, s_fb)
            pts_sub = take_rows_unique(transformed_points, sel_fb)
            mos_sub, off_sub, mos_map = self.motionhead(
                warped, pts_sub, sel_fb_valid, self.pc_range[0], train=train
            )
            default_mos = (
                jnp.zeros((b, n, 2), mos_sub.dtype).at[..., 0].set(1.0)
            )
            put_idx = jnp.where(sel_fb_valid & gate, sel_fb, n)

            def put_rows(base, idx, sub):
                return base.at[idx].set(sub, mode="drop", unique_indices=True)

            results["mos_est"] = jax.vmap(put_rows)(default_mos, put_idx, mos_sub)
            results["offset_est"] = jax.vmap(put_rows)(
                jnp.zeros((b, n, 2), off_sub.dtype), put_idx, off_sub
            )
            # the MOS/offset losses consume these SUBSET rows directly:
            # every decoded row is a (gt|est)-FG row and vice versa (up to
            # the s_fb cap), so training on the subset both avoids the
            # full-N scatter round trip in the backward and excludes the
            # never-decoded overflow rows whose constant default logits
            # the map formulation would count
            results["mos_sub"] = mos_sub.astype(jnp.float32)
            results["offset_sub"] = off_sub.astype(jnp.float32)
            results["sub_sel"] = sel_fb
            results["sub_valid"] = sel_fb_valid & gate
        else:
            mos, offset, mos_map = self.motionhead(
                warped, transformed_points, fb_mask, self.pc_range[0], train=train
            )
            default_mos = jnp.zeros_like(mos).at[..., 0].set(1.0)
            use = (fb_mask & gate)[..., None]
            results["mos_est"] = jnp.where(use, mos, default_mos)
            results["offset_est"] = jnp.where(use, offset, 0.0)

        # ---- 6. per-instance reconstruction (motionnet.py:233-260) ---------
        if mode in ("train", "val"):
            inst_labels = batch["inst_labels"]
            rec_mask = (fb_labels == 1) & point_valid
            inst_motion_gt = batch["inst_motion_gt"].astype(jnp.float32)
        else:
            if inst_labels_override is not None:
                inst_labels = inst_labels_override
            else:
                # test-time clustering runs ON DEVICE (ops/cluster.py replaces
                # the reference's host DBSCAN round-trip at motionnet.py:238)
                from pcaccumulation_tpu.ops.cluster import cluster_moving_points

                ccfg = self.cfg["cluster"]
                mos_pred = jnp.argmax(results["mos_est"], axis=-1)
                inst_labels = jax.vmap(
                    lambda pts, off, mov, val: cluster_moving_points(
                        pts, off, mov, val,
                        eps=ccfg["eps_dbscan"],
                        min_samples=ccfg["min_samples_dbscan"],
                        min_cluster_size=ccfg["min_p_cluster"],
                        pre_voxel=0.05,
                        max_cluster_points=ccfg["max_cluster_points"],
                        n_iters=ccfg["bfs_iters"],
                    )
                )(
                    transformed_points, results["offset_est"],
                    mos_pred == 1, point_valid,
                )
                # cap at the static instance budget; overflow -> background
                k_cap = batch["inst_motion_gt"].shape[1]
                inst_labels = jnp.where(inst_labels < k_cap, inst_labels, 0)
            results["inst_labels_est"] = inst_labels
            rec_mask = (inst_labels != 0) & point_valid
            inst_motion_gt = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32),
                batch["inst_motion_gt"].shape,
            )

        # ---- FG-subset gather: the reconstruction path only touches
        # rec_mask points (the reference processes just the selected FG
        # subset — alignnet.py:198-206). Gathering them into a static
        # capacity before the per-point ungrids + TPointNet cuts the
        # dominant profiled cost (alignnet over all N padded points).
        s_cap = self.cfg["capacity"].get("max_fg_points", 0) or n
        if s_cap < n:
            from pcaccumulation_tpu.ops.segment import (
                compact_mask_indices,
                take_rows_unique,
            )

            # cumsum stable-partition instead of top_k (no full-row sort);
            # indices are distinct -> unique-scatter VJP
            sel, sel_valid = compact_mask_indices(rec_mask, s_cap)

            # ONE packed row gather instead of four: a 1-D element gather
            # costs ~7 ns/element on v5e (120 us for 16k s32 rows — 3x a
            # 32-lane row gather moving 128x the data), so the three int
            # columns ride as bitcast f32 lanes next to the coordinates
            # (tools/profile_gather.py: 401 us -> ~75 us)
            def i2f(a):
                return jax.lax.bitcast_convert_type(
                    a.astype(jnp.int32), jnp.float32
                )[..., None]

            packed_cols = jnp.concatenate(
                [
                    transformed_points,
                    points,  # raw per-frame coords: the backbone ungrid
                             # samples the UNWARPED per-frame BEV maps at
                             # raw positions (motionnet.py:244 uses
                             # input_points, not transformed_points)
                    i2f(time_idx),
                    i2f(inst_labels),
                    i2f(batch["sd_labels"]),
                ],
                axis=-1,
            )  # [B, N, 9]
            sub = take_rows_unique(packed_cols, sel)
            r_points = sub[..., :3]
            r_points_raw = sub[..., 3:6]

            def f2i(col):
                return jax.lax.bitcast_convert_type(col, jnp.int32)

            r_tid = f2i(sub[..., 6])
            r_inst = f2i(sub[..., 7])
            r_sd = f2i(sub[..., 8])
            r_mask = sel_valid
        else:
            sel = None
            r_points, r_tid = transformed_points, time_idx
            r_points_raw = points
            r_inst, r_mask, r_sd = inst_labels, rec_mask, batch["sd_labels"]

        # the reference detaches bev_feats before both warping and the
        # per-point backbone lookup (motionnet.py:206,244)
        # point coords stay f32 (bf16 would quantize sample positions to
        # ~0.1 m); only the gathered feature rows are reduced precision
        ungrid_src = self.cfg.get("perf", {}).get("ungrid_src", "auto")
        if ungrid_src == "auto":
            ungrid_src = (
                "tmajor"
                if (t * bev_feats.shape[-1] > 128 and not train)
                else "folded"
            )
        if ungrid_src == "tmajor":
            # gather from the PRE-fold t-major UNet output instead of the
            # folded canvas: the folded [H,W,T*C] -> [H*W*T, C] view is NOT
            # free under TPU tiled layouts once T*C exceeds the lane width
            # (352 -> 384-lane repack traced 1.19 ms at T=11, PROFILE_r07);
            # the t-major [T,H,W,C] -> [T*H*W, C] collapse of major dims
            # keeps the physical layout (parity:
            # test_temporal_ungrid_folded_matches_unfolded)
            bev_tmajor = jax.lax.stop_gradient(bev_feats).reshape(
                b, t, h, w, cf
            )
            if self.compute_dtype is not None:
                bev_tmajor = bev_tmajor.astype(self.compute_dtype)
            backbone_pp = jax.vmap(
                lambda fm, pts, tid: temporal_ungrid(
                    fm, pts[:, :2], tid, self.pc_range[0]
                )
            )(bev_tmajor, r_points_raw, r_tid).astype(jnp.float32)
        else:
            backbone_pp = jax.vmap(
                lambda fm, pts, tid: temporal_ungrid_folded(
                    fm, pts[:, :2], tid, self.pc_range[0], t
                )
            )(bev_gather, r_points_raw, r_tid).astype(jnp.float32)  # [B, S, C]
        mos_pp = jax.vmap(
            lambda fm, pts: ungrid(fm, pts[:, :2], self.pc_range[0])
        )(mos_map, r_points)  # [B, S, 64]

        rec = self.reconstructor(
            r_points,
            r_tid,
            r_inst,
            r_mask,
            r_sd,
            backbone_pp,
            mos_pp,
            inst_motion_gt,
            results["ego_motion_gt"],
            results["ego_motion_est"],
            train=train,
        )

        rec_gate = jnp.sum(r_mask) > MIN_POINTS
        results["tpointnet_loss_terms"] = jax.tree.map(
            lambda x: jnp.where(rec_gate, x, 0.0),
            rec["tpointnet_loss_terms"],
        )
        results["inst_l2_error"] = jnp.where(rec_gate, rec["inst_l2_error"], 0.0)
        results["dynamic_inst_l2_error"] = jnp.where(
            rec_gate, rec["dynamic_inst_l2_error"], 0.0
        )
        results["inst_pose_est"] = rec["inst_pose_est"]
        if sel is None:
            results["rec_est"] = jnp.where(
                (r_mask & rec_gate)[..., None], rec["sub_rec_est"],
                transformed_points,
            )
        else:
            # scatter the reconstructed subset back; invalid slots are
            # redirected out of range and dropped
            scatter_idx = jnp.where(r_mask & rec_gate, sel, n)

            def put(base, idx, sub):
                return base.at[idx].set(sub, mode="drop")

            results["rec_est"] = jax.vmap(put)(
                transformed_points, scatter_idx, rec["sub_rec_est"]
            )
        results["rec_mask"] = rec_mask
        results["fb_mask"] = fb_mask
        return results
