"""FuseLoss: the complete training objective, jit-safe and masked.

Re-implements the reference's libs/loss.py:52-320 (weighted CE with online
sqrt-inverse-frequency class weights, Lovász-Softmax, Sinkhorn outlier
loss, offset norm+direction losses, γ-decayed TPointNet objective) plus
libs/outlier_loss.py, on padded static-shape results.

IoU bookkeeping matches loss.py:17-50: per-class intersection / union /
pred-positives / gt-positives in thousandths, accumulated by host meters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.lovasz import lovasz_softmax
from pcaccumulation_tpu.ops.numeric import safe_norm
from pcaccumulation_tpu.ops.segment import masked_segment_mean

_EPS = 1e-7
N_CLASSES = 2


def compute_iou_stats(pred, gt, valid):
    """Per-class IoU counters (loss.py:17-50), scaled by 1e-3 like the
    reference so the meters aggregate identical numbers."""
    stats = {}
    inter, union, pred_pos, gt_pos = [], [], [], []
    for c in range(N_CLASSES):
        sel_gt = (gt == c) & valid
        sel_pred = (pred == c) & valid
        i = jnp.sum(sel_gt & sel_pred) / 1e3
        p = jnp.sum(sel_pred) / 1e3
        gp = jnp.sum(sel_gt) / 1e3
        inter.append(i)
        union.append(p + gp - i)
        pred_pos.append(p)
        gt_pos.append(gp)
    stats["intersection"] = jnp.stack(inter)
    stats["union"] = jnp.stack(union)
    stats["pred_positives"] = jnp.stack(pred_pos)
    stats["gt_positives"] = jnp.stack(gt_pos)
    return stats


def weighted_ce(logits, labels, valid, max_weight=50.0):
    """Cross entropy with online sqrt-inverse-frequency class weights
    (loss.py:90-109 + torch CrossEntropyLoss weighted-mean semantics)."""
    validf = valid.astype(logits.dtype)
    counts = jnp.stack(
        [jnp.sum((labels == c) & valid) + _EPS for c in range(N_CLASSES)]
    ).astype(logits.dtype)
    inv_freq = jnp.sum(counts) / counts
    class_w = jnp.clip(jnp.sqrt(inv_freq), 0.0, max_weight)

    logp = jax.nn.log_softmax(logits, axis=-1)
    lab = jnp.clip(labels, 0, N_CLASSES - 1)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    w = class_w[lab] * validf
    return jnp.sum(nll * w) / (jnp.sum(w) + _EPS)


def seg_loss(logits, labels, valid):
    """CE + Lovász + IoU counters (loss.py:111-136)."""
    probs = jax.nn.softmax(logits, axis=-1)
    out = {
        "bce_loss": weighted_ce(logits, labels, valid),
        "lovasz_loss": lovasz_softmax(probs, labels, valid),
        "metric": compute_iou_stats(jnp.argmax(logits, -1), labels, valid),
    }
    return out


def outlier_loss(perm):
    """Sinkhorn slack-mass penalty (libs/outlier_loss.py:13-30).

    perm: [B, P, n, n]. The reference concatenates per-pair [1, n, n]
    matrices; with equal sizes the result reduces to mean(1 - colsum) +
    mean(1 - rowsum).
    """
    ref_out = 1.0 - jnp.sum(perm, axis=-2)  # column sums
    src_out = 1.0 - jnp.sum(perm, axis=-1)  # row sums
    return jnp.mean(ref_out) + jnp.mean(src_out)


def offset_loss(batch, results, max_instances):
    """Offset GT = instance centre of the GT reconstruction minus the
    est-ego-compensated point (loss.py:190-245), masked to GT-foreground."""
    points = batch["points"].astype(jnp.float32)
    time_idx = batch["time_idx"]
    valid = batch["point_valid"]
    inst = batch["inst_labels"]
    fb_mask = (batch["fb_labels"] == 1) & valid

    b, n, _ = points.shape
    k = max_instances

    # GT reconstruction = inst_motion[k, t] @ ego_motion[t] applied per
    # point. Composing the two [K*T]-sized transform tables FIRST (a few
    # hundred 4x4 matmuls) replaces two full-N gather-transform passes
    # with one — the chained ego-comp + reconstruct form traced in the
    # 1.37 ms se3 bucket at T=11 (PROFILE_r09)
    ego_gt = batch["ego_motion_gt"].astype(jnp.float32)       # [B, T, 4, 4]
    inst_gt = batch["inst_motion_gt"].astype(jnp.float32)     # [B, K, T, 4, 4]
    composed = jnp.einsum(
        "bktij,btjl->bktil", inst_gt, ego_gt,
        precision=jax.lax.Precision.HIGHEST,
    )
    gid = (jnp.arange(b, dtype=jnp.int32)[:, None] * k + inst).reshape(-1)
    rec = se3.reconstruct_sequence(
        points.reshape(-1, 3),
        time_idx.reshape(-1),
        gid,
        composed.reshape(b * k, -1, 4, 4),
    )
    centers = masked_segment_mean(rec, gid, valid.reshape(-1), b * k + 1)[: b * k]
    center_pp = centers[jnp.clip(gid, 0, b * k - 1)].reshape(b, n, 3)

    est_comp = results["transformed_points"]
    if "offset_sub" in results:
        # loss rows restricted to the decoded FG subset: GT-FG rows are a
        # subset of the (gt|est) selection, so gathering the per-point
        # terms at sub_sel covers every masked row (up to the cap) while
        # the instance CENTERS above still use every point
        sel, sv = results["sub_sel"], results["sub_valid"]
        center_pp = jnp.take_along_axis(center_pp, sel[..., None], axis=1)
        est_comp = jnp.take_along_axis(est_comp, sel[..., None], axis=1)
        est_off = results["offset_sub"]
        fb_mask = (
            jnp.take_along_axis(batch["fb_labels"], sel, axis=1) == 1
        ) & sv
    else:
        est_off = results["offset_est"]
    gt_off = center_pp[..., :2] - est_comp[..., :2]

    mf = fb_mask.astype(points.dtype)
    cnt = jnp.sum(mf) + _EPS
    # reference: per-coordinate mean over rows, then summed (loss.py:231)
    norm_loss = jnp.sum(
        jnp.sum(jnp.abs(gt_off - est_off) * mf[..., None], axis=(0, 1)) / cnt
    )
    l2_err = jnp.sum(safe_norm(gt_off - est_off, axis=-1) * mf) / cnt

    gt_n = gt_off / (safe_norm(gt_off, axis=-1, keepdims=True) + _EPS)
    est_n = est_off / (safe_norm(est_off, axis=-1, keepdims=True) + _EPS)
    dir_loss = jnp.sum((1.0 - jnp.sum(gt_n * est_n, axis=-1)) * mf) / cnt

    gate = jnp.sum(fb_mask) > 0
    zero = jnp.zeros((), points.dtype)
    return (
        jnp.where(gate, norm_loss, zero),
        jnp.where(gate, dir_loss, zero),
        jnp.where(gate, l2_err, zero),
    )


def fuse_loss(results: dict, batch: dict, weights: dict, max_instances: int) -> dict:
    """Total objective (loss.py:273-320). Returns a stats dict whose 'loss'
    entry is differentiable; metric entries are counters/scalars."""
    stats = {}
    total = 0.0

    # ego motion
    ego_l1 = weights["w_pose_l1_loss"] * results["ego_l1_loss"]
    total += ego_l1
    stats["ego_l1_loss"] = ego_l1
    stats["ego_l2_loss"] = results["ego_l2_loss"]
    stats["ego_rot_error"] = results["ego_rot_error"]
    stats["ego_trans_error"] = results["ego_trans_error"]

    perm = outlier_loss(results["perm_matrix"]) * weights["w_perm_loss"]
    total += perm
    stats["perm_loss"] = perm

    # FB segmentation over occupied pillars (loss.py:164-187). Pillar-level
    # rows, NOT the BEV map: the reference's occupancy mask selects exactly
    # one map cell per occupied pillar, so this is the same row set — and
    # it keeps the 64x lane-padded [B,T,H,W,2] map out of the training
    # graph and shrinks the Lovasz sort ~13x (331k -> 25k rows).
    fb_stats = seg_loss(
        results["fb_logit_pillar"].reshape(-1, 2),
        results["fb_pillar_gt"].astype(jnp.int32).reshape(-1),
        batch["pillar_valid"].reshape(-1),
    )
    fb = (
        weights["w_fb_bce_loss"] * fb_stats["bce_loss"]
        + weights["w_fb_lovasz_loss"] * fb_stats["lovasz_loss"]
    )
    total += fb
    stats["fb_loss"] = fb
    stats["fb_metric"] = fb_stats["metric"]

    # MOS over (gt | est) foreground points (loss.py:139-162). When the
    # model decoded a FG subset (capacity.max_fg_points), train on those
    # rows directly: they are exactly the masked rows (up to the cap), and
    # the [B, N, 2] scatter round trip stays out of the backward.
    fb_mask = (
        (batch["fb_labels"] == 1) | (results["fb_est_per_points"] == 1)
    ) & batch["point_valid"]
    if "mos_sub" in results:
        sel, sv = results["sub_sel"], results["sub_valid"]
        mos_stats = seg_loss(
            results["mos_sub"].reshape(-1, 2),
            jnp.take_along_axis(batch["sd_labels"], sel, axis=1).reshape(-1),
            sv.reshape(-1),
        )
    else:
        mos_stats = seg_loss(
            results["mos_est"].reshape(-1, 2),
            batch["sd_labels"].reshape(-1),
            fb_mask.reshape(-1),
        )
    mos_gate = jnp.sum(fb_mask) > 0
    mos = jnp.where(
        mos_gate,
        weights["w_mos_bce_loss"] * mos_stats["bce_loss"]
        + weights["w_mos_lovasz_loss"] * mos_stats["lovasz_loss"],
        0.0,
    )
    total += mos
    stats["mos_loss"] = mos
    stats["mos_metric"] = mos_stats["metric"]

    # offset
    off_norm, off_dir, off_l2 = offset_loss(batch, results, max_instances)
    off = (
        off_dir * weights["w_offset_dir_loss"]
        + off_norm * weights["w_offset_norm_loss"]
    )
    total += off
    stats["offset_loss"] = off
    stats["offset_l1_loss"] = off_norm
    stats["offset_dir_loss"] = off_dir
    stats["offset_l2_error"] = off_l2

    # TPointNet objective with per-iteration γ decay (loss.py:248-258)
    if "tpointnet_loss_terms" in results:
        terms = results["tpointnet_loss_terms"]
        n_iter = len(terms)
        obj = 0.0
        for i, key in enumerate(sorted(terms.keys())):
            v = terms[key]
            pose_l = (
                weights["w_obj_trans_loss"] * v["trans_loss"]
                + weights["w_obj_rot_loss"] * v["rot_loss"]
            )
            c_loss = (
                weights["w_obj_l1_loss"] * v["l1_loss"]
                + weights["w_obj_pose_loss"] * pose_l
            )
            obj += c_loss * weights["obj_gamma"] ** (n_iter - (i + 1))
        obj = obj * weights["w_obj_loss"]
        total += obj
        stats["obj_loss"] = obj
        stats["inst_l2_error"] = results["inst_l2_error"]
        stats["dynamic_inst_l2_error"] = results["dynamic_inst_l2_error"]

    stats["loss"] = total
    return stats
