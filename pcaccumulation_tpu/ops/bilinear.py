"""Bilinear BEV sampling / scattering — pure XLA gather + lerp.

Replaces the reference's `F.grid_sample` call sites (motionnet.py:110 for
feature warping, pillar_encoder.py:231-267 for per-point `ungrid`) and the
per-batch Python-loop pillar scatter (pillar_encoder.py:125-204) with
vmappable gather/scatter ops on static shapes.

Conventions follow torch `grid_sample(..., align_corners=False)`:
normalised coords u, v in [-1, 1]; pixel centres at (i + 0.5) / size * 2 - 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    img: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample img [C, H, W] at normalised coords u (x), v (y) of shape [N].

    Matches torch.nn.functional.grid_sample semantics with
    align_corners=False and mode='bilinear'. padding_mode in
    {'zeros', 'border'}.

    Returns [N, C].
    """
    c, h, w = img.shape
    # to continuous pixel coords (align_corners=False)
    x = (u + 1.0) * (w * 0.5) - 0.5
    y = (v + 1.0) * (h * 0.5) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        if padding_mode == "border":
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            return img[:, yc, xc]  # [C, N]
        # zeros padding: clamp for the gather, zero the weight
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[:, yc, xc] * valid.astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    w00 = (1 - ty) * (1 - tx)
    w01 = (1 - ty) * tx
    w10 = ty * (1 - tx)
    w11 = ty * tx

    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11  # [C, N]
    return out.T


def ungrid(
    feats: jnp.ndarray,
    points_xy: jnp.ndarray,
    pc_range_min: float,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Per-point bilinear feature lookup from a BEV map.

    feats [C, H, W]; points_xy [N, 2] in metres. Mirrors
    pillar_encoder.py:231-267: u = x / |pc_range_min|, v = y / |pc_range_min|
    (border padding), without the reference's pad-to-grid reshape trick.
    """
    scale = abs(pc_range_min)
    u = points_xy[:, 0] / scale
    v = points_xy[:, 1] / scale
    return bilinear_sample(feats, u, v, padding_mode=padding_mode)


def temporal_ungrid(
    feats: jnp.ndarray,
    points_xy: jnp.ndarray,
    time_idx: jnp.ndarray,
    pc_range_min: float,
) -> jnp.ndarray:
    """Per-point bilinear lookup from the feature map of the point's frame.

    feats [T, H, W, C]; points_xy [N, 2]; time_idx [N] int.
    Mirrors pillar_encoder.py:206-228 (border padding) without the per-frame
    Python loop: the four corner gathers index a flat [T*H*W, C] canvas.
    """
    t, h, w, c = feats.shape
    flat = feats.reshape(t * h * w, c)
    scale = abs(pc_range_min)
    u = points_xy[:, 0] / scale
    v = points_xy[:, 1] / scale
    x = (u + 1.0) * (w * 0.5) - 0.5
    y = (v + 1.0) * (h * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = time_idx.astype(jnp.int32) * (h * w)

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return flat[base + yc * w + xc]  # [N, C]

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    return (
        v00 * ((1 - ty) * (1 - tx))[:, None]
        + v01 * ((1 - ty) * tx)[:, None]
        + v10 * (ty * (1 - tx))[:, None]
        + v11 * (ty * tx)[:, None]
    )


def warp_bev(
    feats: jnp.ndarray,
    pose: jnp.ndarray,
    x_reso: float,
    y_reso: float,
    x_min: float,
    y_min: float,
) -> jnp.ndarray:
    """Warp one BEV feature map by the *inverse* of an SE(3) pose.

    feats [C, H, W]; pose [4, 4] (frame -> anchor). Mirrors
    MotionNet.get_transformed_grid + grid_sample (motionnet.py:45-114):
    each output pixel centre is mapped through inv(pose)'s xy block and the
    source is sampled bilinearly with zero padding.
    """
    c, h, w = feats.shape
    pose_inv = jnp.linalg.inv(pose)

    xs = (jnp.arange(w, dtype=feats.dtype) + 0.5) * x_reso + x_min  # world x
    ys = (jnp.arange(h, dtype=feats.dtype) + 0.5) * y_reso + y_min  # world y
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]

    tx = pose_inv[0, 0] * gx + pose_inv[0, 1] * gy + pose_inv[0, 3]
    ty = pose_inv[1, 0] * gx + pose_inv[1, 1] * gy + pose_inv[1, 3]

    u = (tx / abs(x_min)).reshape(-1)
    v = (ty / abs(y_min)).reshape(-1)
    sampled = bilinear_sample(feats, u, v, padding_mode="zeros")  # [H*W, C]
    return sampled.T.reshape(c, h, w)


def scatter_bev(
    pillar_feats: jnp.ndarray,
    flat_idx: jnp.ndarray,
    valid: jnp.ndarray,
    canvas_size: int,
) -> jnp.ndarray:
    """Scatter pillar features [M, C] to a flat canvas [canvas_size, C].

    flat_idx [M] int32 (t*H*W + y*W + x); invalid pillars are masked.
    Replaces scatter_point_pillar's per-batch Python loop
    (pillar_encoder.py:125-174) with one XLA scatter.
    """
    idx = jnp.where(valid, flat_idx, canvas_size)  # overflow slot
    canvas = jnp.zeros((canvas_size + 1, pillar_feats.shape[-1]), pillar_feats.dtype)
    canvas = canvas.at[idx].set(pillar_feats)
    return canvas[:canvas_size]


def gather_bev(
    canvas_flat: jnp.ndarray,
    flat_idx: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse of scatter_bev: canvas [S, C], flat_idx [M] -> [M, C].

    Replaces inverse_scatter_point_pillar (pillar_encoder.py:177-204).
    """
    idx = jnp.clip(flat_idx, 0, canvas_flat.shape[0] - 1)
    out = canvas_flat[idx]
    return out * valid[:, None].astype(out.dtype)
