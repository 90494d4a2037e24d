"""Space-to-depth (s2d) conv reformulation for narrow-channel BEV convs.

The round-2/3 profiles measured XLA's conv emitter at ~10 TF/s for 3x3
convs with 32 channels at 288^2 — the channel dims cannot fill the
128x128 MXU (tools/PROFILE_r03.md). A 3x3 SAME conv on [H, W, C] is
EXACTLY a 3x3 SAME conv on the space-to-depth tensor [H/2, W/2, 4C]
with a kernel derived from the original by pure placement (no
arithmetic): 4x the FLOPs, but 4x the channel width runs at ~160 TF/s
on v5e — measured 3.8x faster end-to-end for C=32 (tools/profile_s2d.py).

Companion identities used by the UNet's s2d level (models/unet.py):

  - 2x2/2 max-pool        == per-channel max over the 4 s2d sub-positions
  - 2x2/2 transpose-conv  == a 1x1 conv (einsum) producing s2d layout
  - channel concat        == per-sub-position interleaved concat

Sub-position channel layout everywhere: block (r, s) of the original
2x2 pixel tile owns channels [(r*2+s)*C, (r*2+s+1)*C).

Reference: replaces part of /root/reference/models/unet.py:45-233's
conv stack with an MXU-shaped equivalent; parameters keep the canonical
narrow [3, 3, C, Co] shape (checkpoint/converter compatible) and the
expansion happens at apply time.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (H, W even)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """[B, H, W, 4C] -> [B, 2H, 2W, C]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def s2d_expand_kernel(k):
    """Expand a [3, 3, C, Co] SAME-conv kernel to its exact s2d-space
    [3, 3, 4C, 4Co] equivalent.

    For s2d-space tap (u, v) in {-1,0,1}^2, input sub-position (ri, rj)
    and output sub-position (oi, oj), the original tap is
    dp = 2u + ri - oi + 1 (and dq likewise); out-of-range taps are
    structural zeros. Pure placement — differentiable and cheap relative
    to the conv it feeds.
    """
    c, co = k.shape[2], k.shape[3]
    zero = jnp.zeros((c, co), k.dtype)
    rows = []
    for u in (-1, 0, 1):
        cols = []
        for v in (-1, 0, 1):
            iblocks = []
            for ri in (0, 1):
                for rj in (0, 1):
                    oblocks = []
                    for oi in (0, 1):
                        for oj in (0, 1):
                            dp = 2 * u + ri - oi + 1
                            dq = 2 * v + rj - oj + 1
                            if 0 <= dp <= 2 and 0 <= dq <= 2:
                                oblocks.append(k[dp, dq])
                            else:
                                oblocks.append(zero)
                    iblocks.append(jnp.concatenate(oblocks, axis=1))
            cols.append(jnp.concatenate(iblocks, axis=0))  # [4C, 4Co]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [3, 3, 4C, 4Co]


def s2d_concat(a, ca, b, cb):
    """s2d equivalent of jnp.concatenate([A, B], -1) on the original maps:
    interleave the per-sub-position channel blocks of two s2d tensors."""
    blocks = []
    for r in range(4):
        blocks.append(a[..., r * ca:(r + 1) * ca])
        blocks.append(b[..., r * cb:(r + 1) * cb])
    return jnp.concatenate(blocks, axis=-1)


def s2d_group_max_pool(x, c):
    """s2d equivalent of 2x2/2 max-pool: max over the 4 sub-positions.
    [B, H, W, 4C] -> [B, H, W, C]."""
    b, h, w, _ = x.shape
    return x.reshape(b, h, w, 4, c).max(axis=3)


def gather_s2d_3x3_windows(x_s2d, bt, y, x):
    """Gather the 3x3 FULL-RESOLUTION window centred at pixel (y, x) of
    frame-map `bt` out of an s2d tensor, with SAME zero-pad semantics.

    x_s2d [BT, Hs, Ws, 4C]; bt/y/x flat int32 [S] (y, x in full-res
    pixel coordinates, i.e. [0, 2*Hs)). Returns [S, 3, 3, C].

    The 3 consecutive full-res rows/cols around any pixel span exactly 2
    s2d cells, so each window is FOUR 4C-wide row gathers (the fast
    gather shape on v5e: tools/profile_sparse_head.py measures this at
    ~0.24 ms for S=4096 vs 6.4 ms for 2-D windowed dynamic slices) plus
    a parity select. Border windows read a zero pad ring — exactly the
    SAME-conv zeros of a dense 3x3 conv on the full-res map.
    """
    btn, hs, ws, c4 = x_s2d.shape
    c = c4 // 4
    s = bt.shape[0]
    xp = jnp.pad(x_s2d, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(btn * (hs + 2) * (ws + 2), c4)
    # top-left s2d cell of the 2x2 block covering rows y-1..y+1 (+1 pad)
    cy0 = (y - 1) // 2 + 1
    cx0 = (x - 1) // 2 + 1
    base = (bt * (hs + 2) + cy0) * (ws + 2) + cx0
    off = (jnp.arange(2, dtype=base.dtype)[:, None] * (ws + 2)
           + jnp.arange(2, dtype=base.dtype)[None, :]).reshape(-1)
    blk = flat[base[:, None] + off[None, :]]  # [S, 4, 4C]
    # sub-position layout: block (r, s) owns channels [(r*2+s)*C, ...)
    blk = (
        blk.reshape(s, 2, 2, 2, 2, c)      # cy cx sy sx C
        .transpose(0, 1, 3, 2, 4, 5)       # cy sy cx sx C
        .reshape(s, 4, 4, c)               # full-res 4x4 block
    )
    oy = (y - 1) % 2
    ox = (x - 1) % 2
    win = blk[:, 0:3, 0:3]
    for a in (0, 1):
        for d in (0, 1):
            if a == 0 and d == 0:
                continue
            m = ((oy == a) & (ox == d))[:, None, None, None]
            win = jnp.where(m, blk[:, a:a + 3, d:d + 3], win)
    return win
