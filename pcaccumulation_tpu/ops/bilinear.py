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
    """Sample img [H, W, C] at normalised coords u (x), v (y) of shape [N].

    Matches torch.nn.functional.grid_sample semantics with
    align_corners=False and mode='bilinear'. padding_mode in
    {'zeros', 'border'}.

    Layout note: the image is HWC and the four corner lookups gather whole
    [C] rows from a flat [H*W, C] view — contiguous rows are the only
    gather pattern XLA lowers efficiently on TPU (the previous CHW
    column gather was ~10x slower, round-2 profile).

    Returns [N, C].
    """
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
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
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        rows = flat[yc * w + xc]  # [N, C]
        if padding_mode == "border":
            return rows
        # zeros padding: clamp for the gather, zero the weight
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return rows * valid[:, None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    w00 = (1 - ty) * (1 - tx)
    w01 = (1 - ty) * tx
    w10 = ty * (1 - tx)
    w11 = ty * tx

    return (
        v00 * w00[:, None]
        + v01 * w01[:, None]
        + v10 * w10[:, None]
        + v11 * w11[:, None]
    )  # [N, C]


def ungrid(
    feats: jnp.ndarray,
    points_xy: jnp.ndarray,
    pc_range_min: float,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Per-point bilinear feature lookup from a BEV map.

    feats [H, W, C]; points_xy [N, 2] in metres. Mirrors
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


def temporal_ungrid_folded(
    featsf: jnp.ndarray,
    points_xy: jnp.ndarray,
    time_idx: jnp.ndarray,
    pc_range_min: float,
    n_frames: int,
) -> jnp.ndarray:
    """`temporal_ungrid` on a FOLDED canvas [H, W, T*C] (t-minor channels).

    The folded canvas viewed as [H*W*T, C] is a pure reshape (same memory),
    so the per-point corner gathers are identical to the unfolded path with
    flat index (y*W + x)*T + t instead of t*(H*W) + y*W + x.
    """
    h, w, ctot = featsf.shape
    t = n_frames
    c = ctot // t
    flat = featsf.reshape(h * w * t, c)
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
    tid = time_idx.astype(jnp.int32)

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return flat[(yc * w + xc) * t + tid]  # [N, C]

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


def _pixel_affine(pose, x_reso, y_reso, x_min, y_min, h, w, dtype):
    """Pixel-space affine (A, b) of the source-coordinate map: for output
    pixel (i=row, j=col), source pixel = A @ [j, i] + b. Derived
    numerically from the world-coordinate chain used by the gather path,
    so both paths share one definition of the warp."""
    pose_inv = jnp.linalg.inv(pose)

    def src_pix(jd, id_):
        gx = (jd + 0.5) * x_reso + x_min
        gy = (id_ + 0.5) * y_reso + y_min
        tx = pose_inv[0, 0] * gx + pose_inv[0, 1] * gy + pose_inv[0, 3]
        ty = pose_inv[1, 0] * gx + pose_inv[1, 1] * gy + pose_inv[1, 3]
        u = tx / abs(x_min)
        v = ty / abs(y_min)
        xs = (u + 1.0) * (w * 0.5) - 0.5
        ys = (v + 1.0) * (h * 0.5) - 0.5
        return jnp.stack([xs, ys])

    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    p00 = src_pix(zero, zero)
    pj = src_pix(one, zero)
    pi = src_pix(zero, one)
    a_mat = jnp.stack([pj - p00, pi - p00], axis=1)  # [[dx/dj, dx/di], [dy/dj, dy/di]]
    return a_mat, p00


def _row_shift_pallas(img, ki, f, interpret: bool = False, block_rows: int = 8):
    """Pallas TPU row shift: out[r, j] = lerp(img[r, j+k_r], img[r, j+k_r+1]).

    block_rows rows per grid step: the row block is DMA'd into VMEM,
    written into the middle of a zero scratch band, and each row's shifted
    window is read with a scalar-prefetched dynamic slice — no gather op
    anywhere, so it runs at DMA bandwidth instead of TPU gather speed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r0, w, c = img.shape
    rb = block_rows
    pad_r = (-r0) % rb
    if pad_r:
        img = jnp.pad(img, ((0, pad_r), (0, 0), (0, 0)))
        ki = jnp.pad(ki, (0, pad_r))
        f = jnp.pad(f, (0, pad_r))
    r = r0 + pad_r

    def kernel(k_ref, f_ref, rows_ref, out_ref, scratch):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            scratch[...] = jnp.zeros_like(scratch)

        # scratch stays f32: Mosaic cannot prove unaligned dynamic sublane
        # slices for 16-sublane (bf16) tiles; HBM traffic keeps img.dtype
        scratch[:, w:2 * w, :] = rows_ref[...].astype(scratch.dtype)

        def body(i, _):
            k = k_ref[step * rb + i]
            fr = f_ref[step * rb + i].astype(scratch.dtype)
            sl = scratch[i, pl.ds(w + k, w + 1), :]
            out_ref[i, :, :] = (sl[:w] * (1.0 - fr) + sl[1:] * fr).astype(
                out_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, rb, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((rb, w, c), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((rb, w, c), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rb, 3 * w + 1, c), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, w, c), img.dtype),
        interpret=interpret,
    )(ki, f, img)
    return out[:r0]


def _row_shift_xla(img, ki, f):
    """Pure-XLA row shift (CPU / fallback): vmapped dynamic_slice of a
    padded row + two-tap lerp."""
    r, w, c = img.shape
    pad = w
    padded = jnp.pad(img, ((0, 0), (pad, pad + 1), (0, 0)))
    sl = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s + pad, 0), (w + 1, c))
    )(padded, ki)  # [R, W+1, C]
    fr = f[:, None, None].astype(img.dtype)
    return sl[:, :w] * (1.0 - fr) + sl[:, 1:] * fr


@jax.custom_vjp
def _row_shift_sample(img, shifts):
    """out[r, j] = img[r, j + shifts[r]] with linear interp, zeros outside.

    img [R, W, C]; shifts [R] float. On TPU this is a Pallas kernel
    (scalar-prefetched per-row dynamic slice at DMA bandwidth — the XLA
    gather lowering of the same access ran at ~10 GB/s); elsewhere a
    vmapped dynamic_slice of a padded row. shifts are clipped to
    |shift| <= W, i.e. |rotation| <= 90 deg.

    custom_vjp: the op is linear in img with transpose = the same shift
    by -shifts; shift cotangents are ZERO by design (every caller warps
    detached feature maps with detached poses, matching the reference's
    detach at motionnet.py:206)."""
    w = img.shape[1]
    k = jnp.floor(shifts)
    f = (shifts - k).astype(img.dtype)
    ki = jnp.clip(k.astype(jnp.int32), -w, w)
    if jax.default_backend() == "tpu":
        return _row_shift_pallas(img, ki, f)
    return _row_shift_xla(img, ki, f)


def _row_shift_fwd(img, shifts):
    return _row_shift_sample(img, shifts), shifts


def _row_shift_bwd(shifts, g):
    # out = S(img; k+f) is linear in img; its transpose is S(.; -(k+f))
    return _row_shift_sample(g, -shifts), jnp.zeros_like(shifts)


_row_shift_sample.defvjp(_row_shift_fwd, _row_shift_bwd)


def warp_bev(
    feats: jnp.ndarray,
    pose: jnp.ndarray,
    x_reso: float,
    y_reso: float,
    x_min: float,
    y_min: float,
    method: str = "shear",
) -> jnp.ndarray:
    """Warp one BEV feature map by the *inverse* of an SE(3) pose.

    feats [H, W, C]; pose [4, 4] (frame -> anchor). Mirrors
    MotionNet.get_transformed_grid + grid_sample (motionnet.py:45-114):
    each output pixel centre is mapped through inv(pose)'s xy block and the
    source is sampled bilinearly with zero padding.

    method:
      'gather' — exact per-pixel bilinear gather (grid_sample parity);
        ~12 ms per [4,288,288,32] warp on v5e because TPU per-row gather
        is slow (round-2 profile).
      'shear' (default) — three-pass shear decomposition
        R(phi) = Sx(-tan(phi/2)) @ Sy(sin phi) @ Sx(-tan(phi/2)); each
        pass is a per-row constant shift = one vmapped dynamic_slice +
        lerp, which TPU executes at full bandwidth. Exact for the rigid
        (z-rotation + translation) maps ego warping produces, up to the
        interpolation kernel (three 1-D lerps vs one 2-D bilerp); the
        residual non-rotation part of the 2x2 block (sub-degree ego
        pitch/roll) is dropped — sub-0.1-pixel at the grid edge.
    """
    h, w, c = feats.shape
    if method == "gather":
        pose_inv = jnp.linalg.inv(pose.astype(jnp.float32))
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * x_reso + x_min
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * y_reso + y_min
        gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
        tx = pose_inv[0, 0] * gx + pose_inv[0, 1] * gy + pose_inv[0, 3]
        ty = pose_inv[1, 0] * gx + pose_inv[1, 1] * gy + pose_inv[1, 3]
        u = (tx / abs(x_min)).reshape(-1)
        v = (ty / abs(y_min)).reshape(-1)
        sampled = bilinear_sample(feats, u, v, padding_mode="zeros")
        return sampled.reshape(h, w, c)

    # pose/shift math always in f32: a bf16 matrix inverse would corrupt
    # the shear coefficients even when the image data is bf16
    a_mat, b_vec = _pixel_affine(
        pose.astype(jnp.float32), x_reso, y_reso, x_min, y_min, h, w,
        jnp.float32,
    )
    # nearest rotation angle of the 2x2 block (polar projection)
    phi = jnp.arctan2(a_mat[1, 0] - a_mat[0, 1], a_mat[0, 0] + a_mat[1, 1])
    alpha = -jnp.tan(phi / 2.0)
    beta = jnp.sin(phi)
    tx_p, ty_p = b_vec[0], b_vec[1]

    i_idx = jnp.arange(h, dtype=feats.dtype)
    j_idx = jnp.arange(w, dtype=feats.dtype)
    # pass 1 (innermost map): x += alpha*i + (tx - alpha*ty)
    out = _row_shift_sample(feats, alpha * i_idx + tx_p - alpha * ty_p)
    # pass 2: y += beta*j + ty  (row op on the transposed image)
    out = jnp.swapaxes(out, 0, 1)  # [W, H, C], rows indexed by j
    out = _row_shift_sample(out, beta * j_idx + ty_p)
    out = jnp.swapaxes(out, 0, 1)
    # pass 3: x += alpha*i
    return _row_shift_sample(out, alpha * i_idx)


def _row_shift_blocks_pallas(img, ki, f, n_blocks: int, interpret: bool = False,
                             block_rows: int = 8):
    """Row shift with an independent shift per (row, channel block).

    img [R, W, n_blocks*C]; ki [R, n_blocks] int32; f [R, n_blocks] float.
    Block b of the channels (one BEV frame in the folded [..., T*C] layout)
    is shifted by its own amount — this is what lets ONE kernel launch warp
    every frame of a [H, W, T*C] canvas even though each frame has a
    different pose. Same structure as `_row_shift_pallas` otherwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r0, w, ctot = img.shape
    c = ctot // n_blocks
    rb = block_rows
    pad_r = (-r0) % rb
    if pad_r:
        img = jnp.pad(img, ((0, pad_r), (0, 0), (0, 0)))
        ki = jnp.pad(ki, ((0, pad_r), (0, 0)))
        f = jnp.pad(f, ((0, pad_r), (0, 0)))
    r = r0 + pad_r

    # scalar-prefetch operands must be 1-D: a [R, nb] SMEM array is
    # lane-padded to [R, 128] ints (576 KB instead of 18 KB at B=4·288
    # rows — two of them overflow the 1 MB SMEM and the compile fails)
    ki_flat = ki.reshape(-1)
    f_flat = f.reshape(-1)

    def kernel(k_ref, f_ref, rows_ref, out_ref, scratch):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            scratch[...] = jnp.zeros_like(scratch)

        scratch[:, w:2 * w, :] = rows_ref[...].astype(scratch.dtype)

        def body(i, _):
            for b in range(n_blocks):  # static unroll over frames
                k = k_ref[(step * rb + i) * n_blocks + b]
                fr = f_ref[(step * rb + i) * n_blocks + b].astype(scratch.dtype)
                sl = scratch[i, pl.ds(w + k, w + 1), b * c:(b + 1) * c]
                out_ref[i, :, b * c:(b + 1) * c] = (
                    sl[:w] * (1.0 - fr) + sl[1:] * fr
                ).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, rb, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((rb, w, ctot), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((rb, w, ctot), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rb, 3 * w + 1, ctot), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, w, ctot), img.dtype),
        interpret=interpret,
    )(ki_flat, f_flat, img)
    return out[:r0]


def _row_shift_blocks_xla(img, ki, f, n_blocks: int):
    """XLA fallback for the per-block row shift: one `_row_shift_xla` pass
    per channel block (n_blocks is small and static)."""
    r, w, ctot = img.shape
    c = ctot // n_blocks
    outs = [
        _row_shift_xla(img[:, :, b * c:(b + 1) * c], ki[:, b],
                       f[:, b].astype(img.dtype))
        for b in range(n_blocks)
    ]
    return jnp.concatenate(outs, axis=-1)


def _make_row_shift_blocks(n_blocks: int):
    """custom_vjp wrapper of the per-block row shift (linear in img; the
    transpose is the same shift negated, shift cotangents are zero — the
    callers warp detached maps, matching the reference's detach at
    motionnet.py:206)."""

    @jax.custom_vjp
    def shift(img, shifts):  # img [R, W, n_blocks*C]; shifts [R, n_blocks] f32
        w = img.shape[1]
        k = jnp.floor(shifts)
        f = (shifts - k).astype(jnp.float32)
        ki = jnp.clip(k.astype(jnp.int32), -w, w)
        if jax.default_backend() == "tpu":
            return _row_shift_blocks_pallas(img, ki, f, n_blocks)
        return _row_shift_blocks_xla(img, ki, f, n_blocks)

    def fwd(img, shifts):
        return shift(img, shifts), shifts

    def bwd(shifts, g):
        return shift(g, -shifts), jnp.zeros_like(shifts)

    shift.defvjp(fwd, bwd)
    return shift


_ROW_SHIFT_BLOCKS_CACHE: dict = {}


def _row_shift_blocks_vjp(img, shifts, n_blocks: int):
    fn = _ROW_SHIFT_BLOCKS_CACHE.get(n_blocks)
    if fn is None:
        fn = _ROW_SHIFT_BLOCKS_CACHE.setdefault(
            n_blocks, _make_row_shift_blocks(n_blocks)
        )
    return fn(img, shifts)


def row_shift_blocks(img, shifts, n_blocks: int):
    """Per-(row, block) shift, chunked so each pallas launch stays within
    the 128-lane tile width: Mosaic rejects the kernel's narrow
    dynamically-started sublane loads whenever the scratch exceeds 128
    lanes ("cannot statically prove that index ... is a multiple of 8" at
    T*C=160/256, while 32- and 128-lane instances compile). T=4 frames of
    C=32 run as the single-launch fast path; Waymo T=5 runs as 4+1 blocks,
    nuScenes T=11 as 4+4+3."""
    ctot = img.shape[-1]
    c = ctot // n_blocks
    group = max(1, min(n_blocks, 128 // max(c, 1)))
    if group == n_blocks:
        return _row_shift_blocks_vjp(img, shifts, n_blocks)
    outs = []
    for s in range(0, n_blocks, group):
        e = min(s + group, n_blocks)
        outs.append(
            _row_shift_blocks_vjp(img[:, :, s * c:e * c], shifts[:, s:e], e - s)
        )
    return jnp.concatenate(outs, axis=-1)


def warp_bev_folded(
    bevf: jnp.ndarray,
    poses: jnp.ndarray,
    x_reso: float,
    y_reso: float,
    x_min: float,
    y_min: float,
) -> jnp.ndarray:
    """Shear-warp a FOLDED BEV canvas [B, H, W, T*C] by per-frame poses
    [B, T, 4, 4] (frame 0 is normally identity: zero shift = pass-through).

    Same three-pass shear decomposition as `warp_bev`, but each pass is ONE
    `row_shift_blocks` kernel over all frames at once — the folded t-minor
    channel layout is the canonical post-UNet BEV layout (T*C = 128 = the
    TPU lane width), so no transposes or per-frame slicing are needed
    beyond the two H<->W swaps between shear passes.
    """
    b, h, w, ctot = bevf.shape
    t = poses.shape[1]

    a_mat, b_vec = jax.vmap(jax.vmap(
        lambda p: _pixel_affine(
            p.astype(jnp.float32), x_reso, y_reso, x_min, y_min, h, w,
            jnp.float32,
        )
    ))(poses)  # [B, T, 2, 2], [B, T, 2]
    phi = jnp.arctan2(
        a_mat[..., 1, 0] - a_mat[..., 0, 1], a_mat[..., 0, 0] + a_mat[..., 1, 1]
    )  # [B, T]
    alpha = -jnp.tan(phi / 2.0)
    beta = jnp.sin(phi)
    tx_p, ty_p = b_vec[..., 0], b_vec[..., 1]

    i_idx = jnp.arange(h, dtype=jnp.float32)
    j_idx = jnp.arange(w, dtype=jnp.float32)

    def pass_x(img, shifts):  # img [B, H, W, TC]; shifts [B, H, T]
        out = row_shift_blocks(
            img.reshape(b * h, w, ctot), shifts.reshape(b * h, t), t
        )
        return out.reshape(b, h, w, ctot)

    # pass 1: x += alpha*i + (tx - alpha*ty)
    s1 = alpha[:, None, :] * i_idx[None, :, None] + (
        tx_p - alpha * ty_p
    )[:, None, :]  # [B, H, T]
    out = pass_x(bevf, s1)
    # pass 2: y += beta*j + ty (row op on the transposed canvas)
    out = jnp.swapaxes(out, 1, 2)  # [B, W, H, TC]
    s2 = beta[:, None, :] * j_idx[None, :, None] + ty_p[:, None, :]  # [B, W, T]
    out = row_shift_blocks(
        out.reshape(b * w, h, ctot), s2.reshape(b * w, t), t
    ).reshape(b, w, h, ctot)
    out = jnp.swapaxes(out, 1, 2)
    # pass 3: x += alpha*i
    s3 = jnp.broadcast_to(
        alpha[:, None, :] * i_idx[None, :, None], (b, h, t)
    )
    return pass_x(out, s3)


def warp_bev_batch(
    feats: jnp.ndarray,
    poses: jnp.ndarray,
    x_reso: float,
    y_reso: float,
    x_min: float,
    y_min: float,
    method: str = "shear",
) -> jnp.ndarray:
    """Warp F BEV maps [F, H, W, C] by F poses [F, 4, 4] at once.

    Same math as `warp_bev`, but the shear path folds the frame axis into
    the ROW axis of the row-shift op (rows are independent; frames only
    differ in their per-row shift), so each of the three passes is ONE
    kernel call over [F*H, W, C]. `vmap(warp_bev)` instead serializes the
    scalar-prefetch pallas_call through a lax-map while loop (one launch
    per frame + full-tensor dynamic-update-slice each iteration) — that
    loop overhead profiled ~1 ms for 3 frames at 288^2 on v5e.
    """
    if method == "gather":
        return jax.vmap(
            lambda fm, p: warp_bev(fm, p, x_reso, y_reso, x_min, y_min,
                                   method="gather")
        )(feats, poses)

    f, h, w, c = feats.shape
    a_mat, b_vec = jax.vmap(
        lambda p: _pixel_affine(
            p.astype(jnp.float32), x_reso, y_reso, x_min, y_min, h, w,
            jnp.float32,
        )
    )(poses)  # [F, 2, 2], [F, 2]
    phi = jnp.arctan2(
        a_mat[:, 1, 0] - a_mat[:, 0, 1], a_mat[:, 0, 0] + a_mat[:, 1, 1]
    )  # [F]
    alpha = -jnp.tan(phi / 2.0)
    beta = jnp.sin(phi)
    tx_p, ty_p = b_vec[:, 0], b_vec[:, 1]

    # shift math in f32: row indices above 256 are not exactly
    # representable in bf16
    i_idx = jnp.arange(h, dtype=jnp.float32)
    j_idx = jnp.arange(w, dtype=jnp.float32)

    s1 = alpha[:, None] * i_idx + (tx_p - alpha * ty_p)[:, None]  # [F, H]
    out = _row_shift_sample(feats.reshape(f * h, w, c), s1.reshape(-1))
    out = jnp.swapaxes(out.reshape(f, h, w, c), 1, 2)  # [F, W, H, C]
    s2 = beta[:, None] * j_idx + ty_p[:, None]  # [F, W]
    out = _row_shift_sample(out.reshape(f * w, h, c), s2.reshape(-1))
    out = jnp.swapaxes(out.reshape(f, w, h, c), 1, 2)
    s3 = jnp.broadcast_to(alpha[:, None] * i_idx, (f, h))
    out = _row_shift_sample(out.reshape(f * h, w, c), s3.reshape(-1))
    return out.reshape(f, h, w, c)


def scatter_bev(
    pillar_feats: jnp.ndarray,
    flat_idx: jnp.ndarray,
    valid: jnp.ndarray,
    canvas_size: int,
) -> jnp.ndarray:
    """Scatter pillar features [M, C] to a flat canvas [canvas_size, C].

    flat_idx [M] int32 (t*H*W + y*W + x); invalid pillars are masked.
    Replaces scatter_point_pillar's per-batch Python loop
    (pillar_encoder.py:125-174) with one XLA scatter. Valid indices must
    be unique (the voxelizer dedups coords) — invalid ones are redirected
    out of range and dropped, unlocking the fast unique-scatter path.
    """
    idx = jnp.where(valid, flat_idx, canvas_size)  # out of range -> dropped
    canvas = jnp.zeros((canvas_size, pillar_feats.shape[-1]), pillar_feats.dtype)
    return canvas.at[idx].set(pillar_feats, mode="drop", unique_indices=True)


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
