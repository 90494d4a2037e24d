"""Ego-motion head: soft correspondences (Sinkhorn OT) + weighted Kabsch.

Re-implements the reference's models/egomotion.py:30-469 TPU-first: the
per-batch / per-frame-pair Python loops (egomotion.py:409-445) become a
single `vmap` over [B, P] pairs of fixed-size (n_kpts) pillar samples, so
the affinity matmuls, Sinkhorn iterations and batched 3x3 SVDs all run as
one fused XLA computation.

Sampling parity — the keypoint draw deviates from the reference in THREE
deliberate, documented ways (all preserve the uniform marginal over
background pillars; pose-error equivalence is asserted statistically by
tests/test_model.py::test_sampling_deviations_pose_error_parity):

  1. Draw reuse across pairs. The reference re-draws an independent
     randperm per frame PER PAIR (egomotion.py:155-167 — in skip mode
     frame 0 is re-drawn for every pair); here each (batch, frame) is
     drawn ONCE and the sample is reused by every pair touching that
     frame. Each individual draw is still uniform without replacement,
     so every pair sees the same marginal distribution; only the
     between-pair correlation changes, and no loss term couples pairs
     through the sample.
  2. approx_max_k (when approx_sampling=True, the default). The scores
     being ranked are iid uniform, so TPU's bin-reduce approx_max_k
     (recall 0.99) selects an equally-random subset at ~1/5 the cost of
     the full sort. Any subset of a uniform draw is a uniform draw.
  3. Shortfall duplication. When a frame has fewer than n_kpts
     background pillars the reference duplicates the LAST pillar
     (egomotion.py:159-160); here the random path duplicates the first
     DRAWN pillar (a uniformly random one — if anything less biased than
     always-the-last). The deterministic path below replicates the
     reference's last-pillar rule exactly.

Set deterministic_sampling=True (config: pose_estimation.deterministic_
sampling) to remove all randomness for parity testing: the draw becomes
"first n_kpts background pillars in (t, y, x) scan order, shortfall
duplicating the last valid one" — byte-identical to the reference's
deterministic branch (egomotion.py:158-166, choice = arange with
last-point fill) whenever a frame has <= n_kpts background pillars, since
the data layer orders pillars by the same scan order the reference's
flatten produces.

All three sequence strategies are supported (chain | skip | full,
egomotion.py:195-357); configs default to 'skip'.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.ops.kabsch import weighted_kabsch
from pcaccumulation_tpu.ops.sinkhorn import log_sinkhorn, square_distance
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.numeric import safe_norm

_EPS = 1e-7
_HI = jax.lax.Precision.HIGHEST


def pair_lists(n_frames: int, strategy: str):
    """Static (src, tgt) frame-index lists per strategy."""
    if strategy == "skip":
        pairs = [(t, 0) for t in range(1, n_frames)]
        chained_src = list(range(len(pairs)))  # pair index giving pose t->0
    elif strategy == "chain":
        pairs = [(t, t - 1) for t in range(1, n_frames)]
        chained_src = list(range(len(pairs)))
    elif strategy == "full":
        pairs = []
        for gap in range(1, n_frames):
            for a in range(n_frames - 1):
                r = a + gap
                if r < n_frames:
                    pairs.append((r, a))
        # pose t->0 comes from the pair (t, 0)
        chained_src = [pairs.index((t, 0)) for t in range(1, n_frames)]
    else:
        raise ValueError(strategy)
    return pairs, chained_src


def draw_keypoints(rng, frame_mask, n: int, approx: bool,
                   deterministic: bool, scan_key=None):
    """Keypoint draw over [B, T, M] frame masks -> [B, T, n] pillar indices.

    Random mode (deterministic=False): top-k (or approx_max_k on TPU when
    approx=True) of iid-uniform scores on masked rows — a uniform draw
    without replacement; shortfall duplicates the first drawn pillar. See
    the module docstring for the three documented deviations from the
    reference's randperm draw (egomotion.py:155-167).

    Deterministic mode: first n background pillars in the (y, x) BEV scan
    order — the order the reference's canvas flatten produces
    (motionnet.py:419-424 is_occupied.view(-1)) — shortfall duplicating
    the LAST valid drawn pillar, i.e. the reference's
    arange-with-last-fill branch (egomotion.py:158-166) exactly. The
    pillar STORAGE order is the voxelizer's (first-appearance for the
    native hash), so `scan_key` must be y*W + x.
    """
    b, t_frames, m = frame_mask.shape
    if deterministic:
        scores = -jnp.broadcast_to(
            scan_key.astype(jnp.float32)[:, None, :], (b, t_frames, m)
        )
        scores = jnp.where(frame_mask, scores, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(scores, n)
        have = jnp.isfinite(top_vals)
        cnt = jnp.sum(have.astype(jnp.int32), axis=-1, keepdims=True)
        last = jnp.take_along_axis(top_idx, jnp.maximum(cnt - 1, 0), axis=-1)
        return jnp.where(have, top_idx, last)

    scores = jax.random.uniform(rng, (b, t_frames, m))
    scores = jnp.where(frame_mask, scores, -jnp.inf)
    if approx:
        # the scores are iid uniform — this is a random DRAW, not a
        # ranking, so TPU's bin-reduce approx_max_k (recall 0.99) selects
        # an equally-random subset at 1/5 the cost of the full sort (41
        # vs 198 us at [4, 25000] -> 1024 on v5e). Falls back to exact
        # top_k on CPU.
        top_vals, top_idx = jax.lax.approx_max_k(
            scores.reshape(b * t_frames, m), n, recall_target=0.99
        )
        top_vals = top_vals.reshape(b, t_frames, n)
        top_idx = top_idx.reshape(b, t_frames, n)
    else:
        top_vals, top_idx = jax.lax.top_k(scores, n)  # [B, T, n]
    have = jnp.isfinite(top_vals)
    return jnp.where(have, top_idx, top_idx[..., :1])  # dup first


class EgoMotionHead(nn.Module):
    n_kpts: int = 1024
    sinkhorn_iter: int = 3
    slack: bool = True
    n_sweeps: int = 5
    freq: float = 10.0
    max_speed: float = 20.0
    seq_pose: str = "skip"
    approx_sampling: bool = True  # approx_max_k keypoint draw (see above)
    deterministic_sampling: bool = False  # parity mode (see module docstring)
    icp: bool = False            # egomotion.py:440 refine_with_icp
    icp_threshold: float = 0.15  # reference default.yaml:81
    icp_max_iter: int = 50

    @nn.compact
    def __call__(
        self,
        pillar_feats,   # [B, M, C] L2-normalised ego features at pillars
        pillar_mean,    # [B, M, 3]
        pillar_t,       # [B, M] int frame index of each pillar
        pillar_valid,   # [B, M] bool
        pillar_bg,      # [B, M] bool — estimated background
        points,         # [B, N, 3] raw per-frame points (for the loss)
        time_idx,       # [B, N] int
        point_valid,    # [B, N] bool
        ego_motion_gt,  # [B, T, 4, 4]
        point_bg=None,  # [B, N] bool — estimated background points (ICP)
        pillar_scan_key=None,  # [B, M] int y*W + x (deterministic mode only)
        feats_fn=None,  # optional: top_idx [B, T, n] -> [B, T, n, C]
        # L2-normalised f32 features at the sampled pillars. When given,
        # pillar_feats may be None — the caller evaluates its feature
        # head ONLY at the sampled cells (sparse eval path).
    ) -> dict:
        # affinity parameters (egomotion.py:41-42)
        alpha = self.param("alpha", nn.initializers.constant(-5.0), ())
        beta = self.param("beta", nn.initializers.constant(-5.0), ())

        b, m = pillar_valid.shape
        t_frames = self.n_sweeps
        n = self.n_kpts
        pairs, chained_src = pair_lists(t_frames, self.seq_pose)
        src_f = jnp.array([p[0] for p in pairs])
        tgt_f = jnp.array([p[1] for p in pairs])
        durations = jnp.abs(src_f - tgt_f).astype(jnp.float32) / self.freq  # [P]

        # ---- sample n_kpts background pillars per (batch, frame) ----------
        frame_mask = (
            pillar_valid[:, None, :]
            & pillar_bg[:, None, :]
            & (pillar_t[:, None, :] == jnp.arange(t_frames)[None, :, None])
        )  # [B, T, M]
        if self.deterministic_sampling:
            assert pillar_scan_key is not None, (
                "deterministic_sampling requires pillar_scan_key")
            top_idx = draw_keypoints(
                None, frame_mask, n, approx=False, deterministic=True,
                scan_key=pillar_scan_key,
            )
        else:
            top_idx = draw_keypoints(
                self.make_rng("sample"), frame_mask, n,
                approx=self.approx_sampling, deterministic=False,
            )
        # degenerate-frame guard: a frame with ZERO valid background pillars
        # would otherwise feed arbitrary top_k indices into Kabsch. The
        # reference never sees this (it resamples such samples at the
        # dataset level — libs/dataset.py:218-219); here the pair's pose is
        # gated to identity and excluded from the losses below.
        frame_ok = jnp.any(frame_mask, axis=-1)  # [B, T]

        def take(arr, idx):  # arr [B, M, ...] idx [B, T, n]
            flat = idx.reshape(b, t_frames * n)
            out = jnp.take_along_axis(
                arr, flat[..., None] if arr.ndim == 3 else flat, axis=1
            )
            return out.reshape((b, t_frames, n) + arr.shape[2:])

        if feats_fn is not None:
            samp_feats = feats_fn(top_idx)        # [B, T, n, C]
        else:
            samp_feats = take(pillar_feats, top_idx)  # [B, T, n, C]
        samp_coords = take(pillar_mean, top_idx)  # [B, T, n, 3]

        # ---- pairwise OT + Kabsch over all pairs at once ------------------
        fs = samp_feats[:, src_f]   # [B, P, n, C]
        ft = samp_feats[:, tgt_f]
        cs = samp_coords[:, src_f]  # [B, P, n, 3]
        ct = samp_coords[:, tgt_f]

        thr = (durations * self.max_speed) ** 2  # [P]
        support = (
            square_distance(cs, ct, normalised=False)
            < thr[None, :, None, None]
        ).astype(cs.dtype)

        feat_dist = square_distance(fs, ft, normalised=True)  # [B, P, n, n]
        affinity = -(feat_dist - jax.nn.softplus(alpha)) / (jnp.exp(beta) + 0.02)
        log_perm = log_sinkhorn(affinity, n_iters=self.sinkhorn_iter, slack=self.slack)
        perm = jnp.exp(log_perm) * support  # [B, P, n, n]

        pair_ok = frame_ok[:, src_f] & frame_ok[:, tgt_f]  # [B, P]
        # identity perm for degenerate pairs: row/col sums become exactly 1,
        # so the Sinkhorn outlier loss sees zero contribution from them
        perm = jnp.where(
            pair_ok[..., None, None],
            perm,
            jnp.eye(n, dtype=perm.dtype)[None, None],
        )

        row_sum = jnp.sum(perm, axis=-1)  # [B, P, n]
        # the reference divides by row_sum + 1e-20 (_EPS, toolbox/
        # utils.py:13) so near-zero-mass rows converge to the weighted
        # average of their targets (their Kabsch weight row_sum ~ 0
        # silences them). A literal 1e-20 is an f32 trap in reverse mode:
        # the VJP squares the denominator and (1e-20)^2 underflows to 0,
        # turning zero-support rows into inf * 0 = NaN grads. Flooring at
        # 1e-12 is forward-identical within fp tolerance (rows with
        # row_sum < 1e-12 carry < 1e-12 Kabsch weight) and keeps
        # (1e-12)^2 = 1e-24 comfortably normal.
        weighted_t = jnp.einsum("bpnm,bpmc->bpnc", perm, ct, precision=_HI) / (
            jnp.maximum(row_sum[..., None], 1e-12)
        )
        rot, trans = weighted_kabsch(cs, weighted_t, row_sum)  # [B,P,3,3],[B,P,3]
        pose_pairs = se3.make_transform(rot, trans)  # [B, P, 4, 4]
        pose_pairs = jnp.where(
            pair_ok[..., None, None],
            pose_pairs,
            jnp.eye(4, dtype=pose_pairs.dtype)[None, None],
        )

        # ---- ground-truth relative poses for every pair -------------------
        gt_src = ego_motion_gt[:, src_f]  # [B, P, 4, 4]
        gt_tgt = ego_motion_gt[:, tgt_f]
        pose_gt_pairs = se3.relative_pose(gt_src, gt_tgt)

        # ---- per-pair point L1/L2 losses (egomotion.py:232-239) -----------
        # applied to the source frame's PILLAR MEANS (all occupied pillars,
        # not bg-masked and not raw points): the reference's `ref_points`
        # is `points_list[ref_idx]`, the per-frame occupied-pillar mean
        # list built from pts_mean_map (egomotion.py:298,327,423-426)
        pc_est = se3.apply_transform(pillar_mean[:, None], pose_pairs)  # [B,P,M,3]
        pc_gt = se3.apply_transform(pillar_mean[:, None], pose_gt_pairs)
        diff = pc_est - pc_gt
        in_frame = (
            (pillar_t[:, None, :] == src_f[None, :, None])
            & pillar_valid[:, None, :]
        ).astype(points.dtype)  # [B, P, M]
        count = jnp.sum(in_frame, axis=-1) + _EPS
        l1_pp = jnp.sum(jnp.sum(jnp.abs(diff), axis=-1) * in_frame, axis=-1) / count
        l2_pp = jnp.sum(safe_norm(diff, axis=-1) * in_frame, axis=-1) / count
        okf = pair_ok.astype(points.dtype)  # degenerate pairs excluded
        n_ok = jnp.sum(okf) + _EPS
        ego_l1_loss = jnp.sum(l1_pp * okf) / n_ok
        ego_l2_loss = jnp.sum(l2_pp * okf) / n_ok

        # ---- chain into frame->anchor poses -------------------------------
        eye = jnp.broadcast_to(jnp.eye(4, dtype=points.dtype), (b, 1, 4, 4))
        if self.seq_pose in ("skip", "full"):
            chained_est = jnp.concatenate(
                [eye, pose_pairs[:, jnp.array(chained_src)]], axis=1
            )
        else:  # chain: left-compose consecutive estimates
            poses = [jnp.eye(4, dtype=points.dtype)[None].repeat(b, 0)]
            for p_idx in chained_src:
                poses.append(se3.compose(poses[-1], pose_pairs[:, p_idx]))
            chained_est = jnp.stack(poses, axis=1)

        # ---- optional ICP refinement (egomotion.py:360-384, :440) ---------
        # non-differentiable in the reference (host Open3D): stop-gradient
        if self.icp and point_bg is not None:
            from pcaccumulation_tpu.ops.icp import refine_ego_poses

            chained_est = jax.lax.stop_gradient(
                refine_ego_poses(
                    points, time_idx, point_valid, point_bg, chained_est,
                    threshold=self.icp_threshold,
                    max_iterations=self.icp_max_iter,
                )
            )

        chained_gt = jnp.concatenate(
            [eye, se3.relative_pose(ego_motion_gt[:, 1:], ego_motion_gt[:, :1])],
            axis=1,
        )  # [B, T, 4, 4]

        # ---- rot / trans metrics (egomotion.py:454-458) -------------------
        rot_err = se3.rotation_error_deg(
            chained_est[..., :3, :3], chained_gt[..., :3, :3]
        )
        trans_err = se3.translation_error(
            chained_est[..., :3, 3], chained_gt[..., :3, 3]
        )
        scale = t_frames / (t_frames - 1)
        ego_rot_error = jnp.mean(rot_err) * scale
        ego_trans_error = jnp.mean(trans_err) * scale

        # perm matrices exposed to the outlier loss: pairs reaching the
        # anchor only, matching the reference lists (skip/chain keep all,
        # full keeps anchor pairs — egomotion.py:249,286,337)
        if self.seq_pose == "full":
            perm_out = perm[:, jnp.array(chained_src)]
        else:
            perm_out = perm

        return {
            "ego_motion_est": chained_est,
            "ego_motion_gt": chained_gt,
            "ego_l1_loss": ego_l1_loss,
            "ego_l2_loss": ego_l2_loss,
            "ego_rot_error": ego_rot_error,
            "ego_trans_error": ego_trans_error,
            "perm_matrix": perm_out,
        }
