"""TPointNet + AlignNet: per-instance rigid motion regression.

Re-implements the reference's models/tpointnet.py:167-305 and
models/alignnet.py:40-285 with a static instance capacity K per sample and
masks everywhere. Instances are flattened across the batch into B*K global
slots — exactly what the reference does dynamically by re-basing labels
with a running index (alignnet.py:198-206) — so all segment reductions and
the regressor BatchNorm see the same row population as the reference.

Parity notes:
* the reference's anchor "padding" (alignnet.py:115-163 — instances with no
  anchor-frame points borrow their earliest occupied frame's points as
  frame 0) is reproduced without data movement: a second positional
  embedding pass with t=0 produces, per (instance, frame), exactly the
  embedding the borrowed points would have had; the anchor slot selects it
  at the earliest occupied frame. Counts / MOS maxima / centroids are
  redirected the same way.
* empty instances need no removal: masked ops give them zero weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.models.layers import MLP, MaskedBatchNorm
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.numeric import safe_norm
from pcaccumulation_tpu.ops.segment import (
    masked_segment_max,
    masked_segment_sum,
)

_EPS = 1e-7
_HI = jax.lax.Precision.HIGHEST


def quat_trans_to_tsfm(rep):
    """[..., 7] (quat xyzw + trans) -> [..., 4, 4] (tpointnet.py:20-40)."""
    quat = rep[..., :4]
    quat = quat / (safe_norm(quat, axis=-1, keepdims=True) + _EPS)
    rot = se3.quat_to_matrix(quat)
    return se3.make_transform(rot, rep[..., 4:])


def gt_to_quat_rep(pose_gt, centroids):
    """Recompute GT poses for centred clouds and convert to quat+trans
    (tpointnet.py:43-73). pose_gt [G, T, 4, 4], centroids [G, 3]."""
    rot = pose_gt[..., :3, :3]
    trans = pose_gt[..., :3, 3]
    diff = jnp.einsum(
        "gtij,gj->gti", rot - jnp.eye(3, dtype=pose_gt.dtype), centroids,
        precision=_HI,
    )
    new_trans = trans + diff
    quat = se3.matrix_to_quat(rot)
    rep = jnp.concatenate([quat, new_trans], axis=-1)  # [G, T, 7]
    tsfm = se3.make_transform(rot, new_trans)
    return tsfm, rep


class TPointNet(nn.Module):
    """Pose regressor over G = B*K global instance slots (tpointnet.py:167-305)."""

    n_frames: int = 5
    min_points_per_frame: int = 10
    dtype: object = None  # compute dtype for the embedding MLPs + pools

    @nn.compact
    def __call__(
        self,
        points,        # [P, 3] flattened transformed points (P = B*N)
        time_idx,      # [P] int
        inst_gid,      # [P] int global instance id in [0, G)
        valid,         # [P] bool
        mos_labels,    # [P] int
        frame_feats,   # [P, 32]
        mos_feats,     # [P, 64]
        inst_motion_gt,  # [G, T, 4, 4]
        train: bool = False,
    ) -> dict:
        g, t = inst_motion_gt.shape[:2]
        gt_slots = g * t
        frame_id = (inst_gid * t + time_idx).astype(jnp.int32)
        frame_id = jnp.where(valid, frame_id, gt_slots)  # overflow slot

        # A scatter's device cost is per-ROW, not per-channel (measured on
        # the pillar path — pillar_encoder.pillar_stats). The reference's
        # eight torch_scatter calls (tpointnet.py:227-259, 277-287) are
        # therefore grouped here by (segment-id space, reduce op) into
        # FOUR scatter passes: frame-sums, instance-max, frame-max, and
        # the post-regressor loss sums — 12 -> 4 passes, ~0.8 ms/fwd at
        # S=16k on v5e. Per-channel results are bit-identical.

        # ---- pass 1: frame-id sums [count | xyz] ---------------------------
        ones = jnp.ones_like(points[:, :1])
        sum_a = masked_segment_sum(
            jnp.concatenate([ones, points], axis=-1), frame_id, valid,
            gt_slots + 1,
        )[:gt_slots]
        frame_count_raw = sum_a[:, 0]
        frame_count = frame_count_raw.reshape(g, t)
        occupied = frame_count > 0
        earliest = jnp.argmax(occupied, axis=1)  # first occupied frame
        anchor_empty = ~occupied[:, 0]

        def borrow(arr_gt):
            at_e = jnp.take_along_axis(arr_gt, earliest[:, None], axis=1)[:, 0]
            return arr_gt.at[:, 0].set(
                jnp.where(anchor_empty, at_e, arr_gt[:, 0])
            )

        frame_count = borrow(frame_count)

        frame_centroid = sum_a[:, 1:4] / jnp.maximum(frame_count_raw, 1e-12)[:, None]
        frame_centroid = frame_centroid.reshape(g, t, 3)
        cent_e = jnp.take_along_axis(
            frame_centroid, earliest[:, None, None].repeat(3, -1), axis=1
        )[:, 0]
        inst_centroid = jnp.where(
            anchor_empty[:, None], cent_e, frame_centroid[:, 0]
        )  # [G, 3]

        # ---- embeddings (tpointnet.py:241-259) ------------------------------
        inst_seg = jnp.where(valid, inst_gid.astype(jnp.int32), g)

        # embedding MLPs + pools run in the compute dtype (features are
        # learned activations — bf16-safe); pooled embeddings are cast back
        # so the regressor/BN and every geometric op stay f32
        cd = self.dtype
        f32 = points.dtype

        def to_cd(x):
            return x.astype(cd) if cd is not None else x

        # ---- pass 2: instance-id max [mos_emb | geo_emb] -------------------
        mos_emb_pp = MLP([64, 128, 128], name="motion_embed", dtype=cd)(to_cd(mos_feats))
        geo_emb_pp = MLP([32, 64, 128], name="geo_embed", dtype=cd)(to_cd(frame_feats))
        ec = mos_emb_pp.shape[-1]
        emb_i = masked_segment_max(
            jnp.concatenate([mos_emb_pp, geo_emb_pp], axis=-1), inst_seg,
            valid, g + 1,
        )[:g]
        mos_emb = emb_i[:, :ec].astype(f32)
        geo_emb = emb_i[:, ec:].astype(f32)

        centred = points - inst_centroid[jnp.clip(inst_gid, 0, g - 1)]
        pos_mlp = MLP([32, 64, 128], name="pos_embed", dtype=cd)
        # centred coords in bf16 quantize to ~0.4% relative (~2 cm at 5 m
        # from the centroid) — embedding-path only; geometry stays f32
        frame_in = jnp.concatenate(
            [centred, time_idx[:, None].astype(points.dtype) / t], axis=-1
        )
        # anchor embedding via the t=0 pass (see module docstring)
        anchor_in = jnp.concatenate([centred, jnp.zeros_like(centred[:, :1])], -1)

        # ---- pass 3: frame-id max [inst_mos | frame_emb | anchor_emb] ------
        max_f = masked_segment_max(
            jnp.concatenate(
                [
                    to_cd(mos_labels.astype(points.dtype))[:, None],
                    pos_mlp(to_cd(frame_in)),
                    pos_mlp(to_cd(anchor_in)),
                ],
                axis=-1,
            ),
            frame_id, valid, gt_slots + 1,
        )[:gt_slots]
        inst_mos = borrow(max_f[:, 0].astype(f32).reshape(g, t))
        mos_weights = jnp.where(inst_mos == 0, 0.2, 1.0)
        temporal = (jnp.arange(t, dtype=points.dtype) + 1) / self.n_frames
        frame_weights = (frame_count > self.min_points_per_frame).astype(points.dtype)
        frame_weights = (frame_weights * mos_weights * temporal[None]).reshape(gt_slots)

        pc = (max_f.shape[-1] - 1) // 2
        frame_emb = max_f[:, 1:1 + pc].reshape(g, t, -1).astype(f32)
        anchor_all = max_f[:, 1 + pc:].reshape(g, t, -1).astype(f32)
        anchor_at_e = jnp.take_along_axis(
            anchor_all, earliest[:, None, None].repeat(anchor_all.shape[-1], -1), 1
        )[:, 0]
        anchor_emb = jnp.where(anchor_empty[:, None], anchor_at_e, frame_emb[:, 0])
        frame_emb = frame_emb.at[:, 0].set(anchor_emb)

        # ---- regressor (tpointnet.py:262-271) -------------------------------
        reg_in = jnp.concatenate(
            [
                jnp.repeat(geo_emb, t, axis=0),
                jnp.repeat(mos_emb, t, axis=0),
                frame_emb.reshape(gt_slots, -1),
                jnp.repeat(anchor_emb, t, axis=0),
            ],
            axis=-1,
        )  # [G*T, 512]
        inst_nonempty = jnp.repeat(jnp.any(occupied, axis=1), t)  # [G*T]

        x = nn.Dense(256, name="reg_fc0")(reg_in)
        x = MaskedBatchNorm(name="reg_bn0")(x, mask=inst_nonempty, train=train)
        x = nn.relu(x)
        x = nn.Dense(128, name="reg_fc1")(x)
        x = MaskedBatchNorm(name="reg_bn1")(x, mask=inst_nonempty, train=train)
        x = nn.relu(x)
        rep = nn.Dense(7, name="reg_fc2")(x)  # [G*T, 7]

        pose_est = quat_trans_to_tsfm(rep)  # [G*T, 4, 4]

        # ---- losses (tpointnet.py:273-288) ----------------------------------
        gt_tsfm, gt_rep = gt_to_quat_rep(inst_motion_gt, inst_centroid)

        rec_est = se3.reconstruct_sequence(
            centred, time_idx, inst_gid, pose_est.reshape(g, t, 4, 4)
        )
        rec_gt = se3.reconstruct_sequence(centred, time_idx, inst_gid, gt_tsfm)
        diff = rec_est - rec_gt
        # reference naming: 'l1' is the L2 norm, 'l2' the L1 norm
        # (tpointnet.py:281-282) — kept for metric parity
        l1_pt = safe_norm(diff, axis=-1)
        l2_pt = jnp.sum(jnp.abs(diff), axis=-1)
        # ---- pass 4: frame-id sums [l1 | l2], count shared with pass 1 -----
        sum_l = masked_segment_sum(
            jnp.stack([l1_pt, l2_pt], axis=-1), frame_id, valid, gt_slots + 1
        )[:gt_slots]
        inv_count = 1.0 / jnp.maximum(frame_count_raw, 1e-12)
        w_sum = jnp.sum(frame_weights) + _EPS
        l1_loss = jnp.sum(sum_l[:, 0] * inv_count * frame_weights) / w_sum
        l2_loss = jnp.sum(sum_l[:, 1] * inv_count * frame_weights) / w_sum

        rep_n = rep.at[..., :4].set(
            rep[..., :4] / (safe_norm(rep[..., :4], axis=-1, keepdims=True) + _EPS)
        )
        gt_rep_flat = gt_rep.reshape(gt_slots, 7)
        rot_loss = jnp.sum(
            safe_norm(gt_rep_flat[:, :4] - rep_n[:, :4], axis=-1) * frame_weights
        ) / w_sum
        trans_loss = jnp.sum(
            safe_norm(gt_rep_flat[:, 4:] - rep_n[:, 4:], axis=-1) * frame_weights
        ) / w_sum

        # ---- de-centre + anchor identity (tpointnet.py:290-295) -------------
        rot_e = pose_est[:, :3, :3]
        cent_rep = jnp.repeat(inst_centroid, t, axis=0)
        comp = jnp.einsum(
            "nij,nj->ni", jnp.eye(3, dtype=points.dtype) - rot_e, cent_rep,
            precision=_HI,
        )
        pose_out = se3.make_transform(rot_e, pose_est[:, :3, 3] + comp)
        pose_out = pose_out.reshape(g, t, 4, 4)
        pose_out = pose_out.at[:, 0].set(jnp.eye(4, dtype=points.dtype))

        return {
            "l1_loss": l1_loss,
            "l2_loss": l2_loss,
            "rot_loss": rot_loss,
            "trans_loss": trans_loss,
            "inst_est_motion": pose_out,  # [G, T, 4, 4]
        }


def update_gt_inst_motion(inst_motion_gt, ego_motion_gt, ego_motion_est):
    """inst' = inst @ ego_gt @ inv(ego_est) per (B, K, T) (alignnet.py:9-38)."""
    correction = se3.compose(ego_motion_gt, se3.transform_inverse(ego_motion_est))
    return se3.compose(inst_motion_gt, correction[:, None])  # [B, K, T, 4, 4]


class AlignNet(nn.Module):
    """Iterative TPointNet refinement over the whole batch (alignnet.py:166-285)."""

    n_frames: int = 5
    n_iterations: int = 1
    min_points_per_frame: int = 10
    icp: bool = False            # alignnet.py:266 refine_with_icp
    icp_threshold: float = 0.25  # reference configs/default.yaml:97
    icp_max_iter: int = 50
    icp_max_points: int = 1024   # static per-instance point budget
    dtype: object = None         # compute dtype for TPointNet embeddings

    @nn.compact
    def __call__(
        self,
        transformed_points,  # [B, N, 3]
        time_idx,            # [B, N]
        inst_idx,            # [B, N] int (0 = background)
        rec_mask,            # [B, N] bool
        mos_labels,          # [B, N]
        backbone_feats,      # [B, N, 32]
        mos_feats,           # [B, N, 64]
        inst_motion_gt,      # [B, K, T, 4, 4] (identity in test mode)
        ego_motion_gt,       # [B, T, 4, 4]
        ego_motion_est,      # [B, T, 4, 4]
        train: bool = False,
    ) -> dict:
        b, k, t = inst_motion_gt.shape[:3]
        n = transformed_points.shape[1]
        g = b * k

        tpointnet = TPointNet(
            n_frames=self.n_frames,
            min_points_per_frame=self.min_points_per_frame,
            dtype=self.dtype,
            name="alignment",
        )

        # flatten batch -> global instance ids (alignnet.py:198-206)
        gid = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * k + inst_idx.astype(jnp.int32)
        ).reshape(-1)
        pts = transformed_points.reshape(-1, 3)
        tid = time_idx.reshape(-1)
        valid = rec_mask.reshape(-1)
        mos_l = mos_labels.reshape(-1)
        bb_f = backbone_feats.reshape(-1, backbone_feats.shape[-1])
        mos_f = mos_feats.reshape(-1, mos_feats.shape[-1])

        updated_gt = update_gt_inst_motion(
            inst_motion_gt, ego_motion_gt, ego_motion_est
        ).reshape(g, t, 4, 4)
        gt0 = updated_gt

        points = pts
        final_pose = None
        loss_terms = {}
        for it in range(self.n_iterations):
            pred = tpointnet(
                jax.lax.stop_gradient(points),
                tid,
                gid,
                valid,
                mos_l,
                bb_f,
                mos_f,
                jax.lax.stop_gradient(updated_gt),
                train=train,
            )
            loss_terms[f"{it}_th"] = {
                kk: pred[kk] for kk in ("l1_loss", "l2_loss", "rot_loss", "trans_loss")
            }
            est = pred["inst_est_motion"]  # [G, T, 4, 4]
            points = se3.reconstruct_sequence(points, tid, gid, est)

            # counter-rotate the GT (alignnet.py:250-254)
            r_new = jnp.einsum(
                "gtij,gtlj->gtil", updated_gt[..., :3, :3], est[..., :3, :3],
                precision=_HI,
            )
            t_new = updated_gt[..., :3, 3] - jnp.einsum(
                "gtij,gtj->gti", r_new, est[..., :3, 3], precision=_HI
            )
            updated_gt = se3.make_transform(r_new, t_new)

            final_pose = est if final_pose is None else se3.compose(est, final_pose)

        # optional per-instance ICP refinement (alignnet.py:266) —
        # non-differentiable in the reference (host Open3D): stop-gradient
        if self.icp:
            from pcaccumulation_tpu.ops.icp import refine_instance_poses

            final_pose = jax.lax.stop_gradient(
                refine_instance_poses(
                    jax.lax.stop_gradient(pts), tid, gid, valid, final_pose,
                    threshold=self.icp_threshold,
                    max_iterations=self.icp_max_iter,
                    max_points=self.icp_max_points,
                )
            )

        # final error (alignnet.py:269-280)
        rec_est = se3.reconstruct_sequence(pts, tid, gid, final_pose)
        rec_gt = se3.reconstruct_sequence(pts, tid, gid, gt0)
        l2 = safe_norm(rec_est - rec_gt, axis=-1)
        w_full = (valid & (tid > 0)).astype(l2.dtype)
        w_dyn = w_full * (mos_l == 1)
        inst_l2_error = jnp.sum(l2 * w_full) / (jnp.sum(w_full) + _EPS)
        dyn_l2_error = jnp.sum(l2 * w_dyn) / (jnp.sum(w_dyn) + _EPS)

        return {
            "tpointnet_loss_terms": loss_terms,
            "inst_l2_error": inst_l2_error,
            "dynamic_inst_l2_error": dyn_l2_error,
            "inst_pose_est": final_pose.reshape(b, k, t, 4, 4),
            "sub_rec_est": rec_est.reshape(b, n, 3),
        }
