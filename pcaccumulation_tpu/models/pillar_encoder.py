"""Pillar feature encoder + BEV scatter, fully batched with masked segment ops.

Re-implements the reference's models/pillar_encoder.py (PillarFeatureNet
with ConvOccNet-style local max pooling between ResNet blocks, lines
59-122, and the scatter/gather/ungrid helpers, lines 125-267). Per-batch
Python loops are replaced by `vmap` and a single XLA scatter.

Shapes: B batch, N max points, M max pillars, T frames, H=W BEV size.
`pillar_of_point` follows the voxelizer convention: values in [0, M-1] for
valid points, M for invalid (the overflow segment).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.models.layers import ResnetBlockFC
from pcaccumulation_tpu.ops.segment import (
    masked_seg_pool_max,
    masked_segment_max,
    masked_segment_mean,
    masked_segment_sum,
)


def pillar_flat_index(pillar_coords, grid_hw):
    """[..., M, 3] (t, y, x) -> flat t*H*W + y*W + x."""
    h, w = grid_hw
    return (
        pillar_coords[..., 0] * (h * w)
        + pillar_coords[..., 1] * w
        + pillar_coords[..., 2]
    ).astype(jnp.int32)


def pillar_flat_index_folded(pillar_coords, grid_hw, n_frames):
    """[..., M, 3] (t, y, x) -> flat (y*W + x)*T + t.

    Row index into the [H*W*T, C] view of a FOLDED canvas [H, W, T*C]
    (t-minor channel blocks — the canonical post-UNet BEV layout)."""
    h, w = grid_hw
    return (
        (pillar_coords[..., 1] * w + pillar_coords[..., 2]) * n_frames
        + pillar_coords[..., 0]
    ).astype(jnp.int32)


def gather_folded_at_pillars(canvasf, pillar_coords, pillar_valid, n_frames):
    """FOLDED canvas [B, H, W, T*C] -> [B, M, C] at each pillar's (t, y, x).

    Same op as `gather_bev_at_pillars`, against the [H*W*T, C] reshape-view
    of the folded canvas (pure reshape — identical memory)."""
    b, h, w, ctot = canvasf.shape
    c = ctot // n_frames
    flat_canvas = canvasf.reshape(b, h * w * n_frames, c)
    idx = jnp.clip(
        pillar_flat_index_folded(pillar_coords, (h, w), n_frames),
        0, h * w * n_frames - 1,
    )
    out = jnp.take_along_axis(flat_canvas, idx[..., None], axis=1)
    return out * pillar_valid[..., None].astype(out.dtype)


def scatter_pillars_to_bev(pillar_feats, pillar_coords, pillar_valid, n_frames, grid_hw):
    """[B, M, C] -> dense canvas [B, T, H, W, C] via one scatter per sample.

    Replaces scatter_point_pillar (pillar_encoder.py:125-174).
    """
    h, w = grid_hw
    flat = pillar_flat_index(pillar_coords, grid_hw)  # [B, M]
    size = n_frames * h * w

    def one(feats, idx, valid):
        # valid pillar indices are unique by construction (the voxelizer
        # dedups coords); invalid ones are redirected out of range and
        # dropped — unlocks XLA's fast unique-scatter path (~35x on v5e)
        idx = jnp.where(valid, idx, size)
        canvas = jnp.zeros((size, feats.shape[-1]), feats.dtype)
        canvas = canvas.at[idx].set(feats, mode="drop", unique_indices=True)
        return canvas.reshape(n_frames, h, w, feats.shape[-1])

    return jax.vmap(one)(pillar_feats, flat, pillar_valid)


def scatter_pillars_to_bev_gather(pillar_feats, pillar_coords, pillar_valid,
                                  n_frames, grid_hw):
    """Gather-formulated densification: [B, M, C] -> [B, T, H, W, C].

    Semantically identical to `scatter_pillars_to_bev` (same inputs, same
    output, same gradient) but materialises the canvas as a row GATHER from
    the pillar table through an inverse cell->pillar map, built by a cheap
    1-channel int scatter. Rationale (PROFILE_r07): at nuScenes scale
    (T=11, canvas rows = 912384, M = 40000) XLA lays the canvas out
    channel-major [C, THW] for its conv consumers, which turns the wide row
    scatter into 34 strided element writes per pillar — 5.56 ms traced. The
    inverse-map build pays that write pattern only for ONE int channel; the
    wide data then streams out as a contiguous gather.

    Backward: valid pillars own distinct cells (the voxelizer dedups
    coords), so d/dfeats is exactly the canvas cotangent gathered back at
    each pillar's cell (rows for invalid pillars are zeroed) — identical to
    the unique-scatter VJP of the scatter formulation.
    """
    h, w = grid_hw
    b, m, c = pillar_feats.shape
    size = n_frames * h * w
    flat = pillar_flat_index(pillar_coords, grid_hw)
    idx_safe = jnp.where(pillar_valid, flat, size).astype(jnp.int32)  # [B, M]

    @jax.custom_vjp
    def densify(feats, idx):
        def one(f, ix):
            inv = jnp.full((size,), m, jnp.int32).at[ix].set(
                jnp.arange(m, dtype=jnp.int32), mode="drop",
                unique_indices=True,
            )
            table = jnp.concatenate([f, jnp.zeros((1, c), f.dtype)], axis=0)
            return jnp.take(table, inv, axis=0)

        return jax.vmap(one)(feats, idx).reshape(b, n_frames, h, w, c)

    def fwd(feats, idx):
        return densify(feats, idx), idx

    def bwd(idx, g):
        gf = g.reshape(b, size, c)
        # clip BOTH ends: a negative flat index (out-of-grid coords — only
        # possible if the voxelizer's in-range invariant is violated) is
        # dropped by the forward's .at[].set(mode="drop"), so its cotangent
        # must be zero too, not a wrap-around row
        safe = jnp.clip(idx, 0, size - 1)
        rows = jnp.take_along_axis(gf, safe[..., None], axis=1)
        in_range = (idx >= 0) & (idx < size)
        rows = rows * in_range[..., None].astype(rows.dtype)
        return rows, None

    densify.defvjp(fwd, bwd)
    return densify(pillar_feats, idx_safe)


def gather_packed_s2d_at_pillars(packed, pillar_coords, pillar_valid, n_real):
    """Packed HALF-resolution s2d map [B, T, H/2, W/2, CL] -> [B, M, n_real]
    rows at each pillar's full-resolution cell (t, y, x).

    Produced by S2DPackedNarrowConv3x3: channel block (y&1)*2 + (x&1)
    (width n_real) holds that sub-position's channels. The forward
    gathers the full CL-wide row (narrow row gathers pay the 64x
    lane-padding penalty) and selects the block on the tiny [B, M, 4]
    view. The backward is a UNIQUE scatter-add at (cell, sub-position)
    granularity: two pillars may share a half-res cell but never a
    (cell, sub-position) pair, so cotangents never collide.
    """
    b, t, hs, ws, cl = packed.shape
    r = t * hs * ws
    y, x = pillar_coords[..., 1], pillar_coords[..., 2]
    cell = (pillar_coords[..., 0] * (hs * ws)
            + (y // 2) * ws + (x // 2)).astype(jnp.int32)
    block = ((y % 2) * 2 + (x % 2)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, r - 1)
    flat = packed.reshape(b, r, cl)
    safe_slot = jnp.where(pillar_valid, cell * 4 + block, r * 4)

    @jax.custom_vjp
    def gather(fc, cell_ix, slot_ix):
        rows = jnp.take_along_axis(fc, cell_ix[..., None], axis=1)
        sel = rows[..., :4 * n_real].reshape(b, -1, 4, n_real)
        blk = (slot_ix % 4)[..., None, None]
        return jnp.take_along_axis(sel, jnp.minimum(blk, 3), axis=2)[:, :, 0]

    def fwd(fc, cell_ix, slot_ix):
        return gather(fc, cell_ix, slot_ix), slot_ix

    def bwd(slot_ix, g):
        def one(s, gg):
            cot = jnp.zeros((r * 4, n_real), g.dtype).at[s].add(
                gg, mode="drop", unique_indices=True
            )
            return jnp.pad(cot.reshape(r, 4 * n_real),
                           ((0, 0), (0, cl - 4 * n_real)))

        return jax.vmap(one)(slot_ix, g), None, None

    gather.defvjp(fwd, bwd)
    out = gather(flat, cell, safe_slot)
    return out * pillar_valid[..., None].astype(out.dtype)


def gather_bev_at_pillars(canvas, pillar_coords, pillar_valid):
    """[B, T, H, W, C] -> [B, M, C] at each pillar's cell.

    Replaces inverse_scatter_point_pillar (pillar_encoder.py:177-204).
    The backward is a UNIQUE-index scatter-add: every valid pillar owns a
    distinct canvas cell, and invalid rows are routed to a dropped
    overflow slot, so the cotangent scatter never collides — the generic
    scatter-add this replaces traced 2.5 ms at bench shapes.
    """
    b, t, h, w, c = canvas.shape
    r = t * h * w
    flat_canvas = canvas.reshape(b, r, c)
    idx = jnp.clip(pillar_flat_index(pillar_coords, (h, w)), 0, r - 1)
    safe = jnp.where(pillar_valid, idx, r)  # overflow slot, dropped in bwd

    @jax.custom_vjp
    def gather(fc, ix):
        return jnp.take_along_axis(fc, jnp.minimum(ix, r - 1)[..., None], axis=1)

    def fwd(fc, ix):
        return gather(fc, ix), ix

    def bwd(ix, g):
        def one(i, gg):
            return jnp.zeros((r, c), g.dtype).at[i].add(
                gg, mode="drop", unique_indices=True
            )

        return jax.vmap(one)(ix, g), None

    gather.defvjp(fwd, bwd)
    out = gather(flat_canvas, safe)
    return out * pillar_valid[..., None].astype(out.dtype)


class PillarFeatureNet(nn.Module):
    """Per-point MLP with inter-block pillar max pooling, final pillar max.

    Matches PillarFeatureNet.forward (pillar_encoder.py:97-122): 9-dim input
    [xyz, dist-to-pillar-mean, dxy-to-pillar-centre, t], spatial dims
    normalised by |pc_range[0]|, t by n_sweeps.
    """

    num_filters: int = 32
    depth: int = 3
    voxel_size: tuple = (0.25, 0.25, 8.0)
    pc_range: tuple = (-36.0, -36.0, -5.0, 36.0, 36.0, 3.0)
    n_sweeps: int = 5
    dtype: object = None  # compute dtype for the MLP stack + pools

    @nn.compact
    def __call__(self, points, time_idx, point_valid, pillar_of_point,
                 pillar_coords, pillar_mean, max_pillars: int):
        """
        Args:
          points:       [B, N, 3]
          time_idx:     [B, N] int
          point_valid:  [B, N] bool
          pillar_of_point: [B, N] int in [0, M]
          pillar_coords:   [B, M, 3] (t, y, x)
          pillar_mean:     [B, M, 3] per-pillar mean xyz
        Returns:
          pillar features [B, M, num_filters]
        """
        b, n, _ = points.shape
        m = max_pillars
        scale = abs(self.pc_range[0])
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.pc_range[0]
        y_offset = vy / 2 + self.pc_range[1]

        # gather per-point pillar attributes (clip the overflow index)
        p_idx = jnp.clip(pillar_of_point, 0, m - 1)
        mean_pp = jnp.take_along_axis(pillar_mean, p_idx[..., None], axis=1)
        coords_pp = jnp.take_along_axis(pillar_coords, p_idx[..., None], axis=1)

        dist_to_mean = points - mean_pp
        f_center_x = points[..., 0] - (coords_pp[..., 2].astype(points.dtype) * vx + x_offset)
        f_center_y = points[..., 1] - (coords_pp[..., 1].astype(points.dtype) * vy + y_offset)

        feats = jnp.concatenate(
            [
                points / scale,
                dist_to_mean / scale,
                f_center_x[..., None] / scale,
                f_center_y[..., None] / scale,
                time_idx[..., None].astype(points.dtype) / self.n_sweeps,
            ],
            axis=-1,
        )  # [B, N, 9]

        # flatten batch for segment ops: segment id = b * (M + 1) + pillar
        seg_ids = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * (m + 1) + pillar_of_point
        ).reshape(-1)
        valid_flat = point_valid.reshape(-1)
        num_segments = b * (m + 1)

        def pool(x_flat):
            # fused scatter-free pool: per-point max over the point's
            # pillar (sorted ids -> Pallas segmented scan on TPU)
            return masked_seg_pool_max(x_flat, seg_ids, valid_flat,
                                       num_segments)

        # feature construction stays f32 (bf16 would quantize coordinates to
        # ~0.1 m); the MLP/pool stack runs in the compute dtype — inputs are
        # already normalized to [-1, 1] where bf16's 8-bit mantissa is fine
        if self.dtype is not None:
            feats = feats.astype(self.dtype)
        net = nn.Dense(2 * self.num_filters, name="fc_pos",
                       dtype=self.dtype)(feats).reshape(b * n, -1)
        net = ResnetBlockFC(self.num_filters, name="block0", dtype=self.dtype)(net)
        for i in range(1, self.depth):
            net = jnp.concatenate([net, pool(net)], axis=-1)
            net = ResnetBlockFC(self.num_filters, name=f"block{i}",
                                dtype=self.dtype)(net)
        net = nn.Dense(self.num_filters, name="fc_c", dtype=self.dtype)(net)

        pooled = masked_segment_max(net, seg_ids, valid_flat, num_segments,
                                    indices_are_sorted=True)
        # stays in the compute dtype: the only consumer is the BEV canvas
        # scatter + UNet (both run in the compute dtype anyway; returning
        # f32 here would double the scatter's HBM traffic)
        return pooled.reshape(b, m + 1, self.num_filters)[:, :m]


def pillar_stats(points, fb_labels, point_valid, pillar_of_point, max_pillars):
    """Per-pillar mean xyz AND fb-label max in ONE masked segment-sum pass.

    Replaces the separate `pillar_means` + `pillar_label_max` calls
    (torch_scatter mean/max at motionnet.py:159-160): fb labels are
    binary, so max == (sum > 0), and packing the label AND the point
    count as extra channels of the xyz sum collapses three scatter
    passes into one (a scatter's cost is per-row, not per-channel: the
    single-channel count scatter alone profiled 0.53 ms at N=60k on
    v5e, the same as the whole 5-channel pass).

    Returns (pillar_mean [B, M, 3], fb_pillar [B, M] int32).
    """
    b, n, _ = points.shape
    m = max_pillars
    seg_ids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * (m + 1) + pillar_of_point
    ).reshape(-1)
    valid_flat = point_valid.reshape(-1)
    data = jnp.concatenate(
        [
            points,
            (fb_labels > 0).astype(points.dtype)[..., None],
            jnp.ones_like(points[..., :1]),  # count channel
        ],
        axis=-1,
    ).reshape(b * n, 5)
    total = masked_segment_sum(data, seg_ids, valid_flat, b * (m + 1),
                               indices_are_sorted=True)
    count = total[:, 4]
    mean = total[:, :3] / jnp.maximum(count, 1e-12)[:, None]
    fb = (total[:, 3] > 0).astype(jnp.int32)
    return (
        mean.reshape(b, m + 1, 3)[:, :m],
        fb.reshape(b, m + 1)[:, :m],
    )


def pillar_means(points, point_valid, pillar_of_point, max_pillars):
    """Masked per-pillar mean of point xyz: [B, N, 3] -> [B, M, 3]
    (replaces torch_scatter mean at motionnet.py:159)."""
    b, n, _ = points.shape
    seg_ids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * (max_pillars + 1) + pillar_of_point
    ).reshape(-1)
    out = masked_segment_mean(
        points.reshape(b * n, 3), seg_ids, point_valid.reshape(-1),
        b * (max_pillars + 1), indices_are_sorted=True,
    )
    return out.reshape(b, max_pillars + 1, 3)[:, :max_pillars]


def pillar_label_max(labels, point_valid, pillar_of_point, max_pillars):
    """Masked per-pillar max of integer labels: [B, N] -> [B, M]
    (replaces torch_scatter max at motionnet.py:160)."""
    b, n = labels.shape
    seg_ids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * (max_pillars + 1) + pillar_of_point
    ).reshape(-1)
    out = masked_segment_max(
        labels.reshape(b * n).astype(jnp.float32), seg_ids, point_valid.reshape(-1),
        b * (max_pillars + 1), indices_are_sorted=True,
    )
    return out.reshape(b, max_pillars + 1)[:, :max_pillars].astype(labels.dtype)
