"""Measure dense SegHead2D vs sparse patch-eval at sampled pillars.

The ego-feature head computes dense [B*T, 288, 288, 64] maps but the
eval-mode graph only ever reads them at T*n_kpts = 4096 sampled pillar
cells (models/egomotion.py top_k sampling). This measures evaluating the
two 3x3 convs only on gathered 5x5 patches.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BT, H, W, C = 4, 288, 288, 32
MID, OUT = 64, 64
S = 4096


def timeit(fn, *args, iters=300, warm=30):
    def loop(n, args):
        def body(i, a):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            eps = (leaf.ravel()[0].astype(jnp.float32) * 1e-20).astype(a[0].dtype)
            return (a[0] + eps,) + a[1:]

        return jax.lax.fori_loop(0, n, body, args)[0].ravel()[0]

    jl = jax.jit(loop, static_argnums=0)
    float(jl(warm, args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jl(warm, args))
        t1 = time.perf_counter()
        float(jl(warm + iters, args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / iters * 1e6
        best = dt if best is None else min(best, dt)
    return best


def main():
    k = jax.random.key(0)
    x = jax.random.normal(k, (BT, H, W, C), jnp.bfloat16)
    k0 = jax.random.normal(k, (3, 3, C, MID), jnp.bfloat16)
    k1 = jax.random.normal(k, (3, 3, MID, OUT), jnp.bfloat16)
    scale = jnp.ones((MID,), jnp.bfloat16)
    bias = jnp.zeros((MID,), jnp.bfloat16)
    bt = jax.random.randint(k, (S,), 0, BT)
    yy = jax.random.randint(k, (S,), 0, H)
    xx = jax.random.randint(k, (S,), 0, W)

    def dense(x, k0, k1):
        h = jax.lax.conv_general_dilated(
            x, k0, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h * scale + bias)
        return jax.lax.conv_general_dilated(
            h, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def gather_patches(x, bt, yy, xx, r):
        btn, hh, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
        kk = 2 * r + 1
        flat = xp.reshape(btn * (hh + 2 * r), (ww + 2 * r) * c)
        row0 = bt * (hh + 2 * r) + yy  # top row of patch (already +r-r)
        col0 = xx * c                  # left col in flattened row

        def slice_rows(r0, c0):
            return jax.lax.dynamic_slice(flat, (r0, c0), (kk, kk * c))

        return jax.vmap(slice_rows)(row0, col0).reshape(S, kk, kk, c)

    def sparse(x, k0, k1):
        p = gather_patches(x, bt, yy, xx, 2)  # [S,5,5,C]
        h = jax.lax.conv_general_dilated(
            p, k0, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h * scale + bias)  # [S,3,3,MID]
        out = jax.lax.conv_general_dilated(
            h, k1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[:, 0, 0]

    def sparse_im2col(x, k0, k1):
        p = gather_patches(x, bt, yy, xx, 2)  # [S,5,5,C]
        cols = jnp.stack(
            [p[:, dy:dy + 3, dx:dx + 3].reshape(S, -1)
             for dy in range(3) for dx in range(3)], axis=1
        )  # [S, 9, 9C]
        h = cols @ k0.reshape(9 * C, MID)  # [S, 9, MID]
        h = jax.nn.relu(h * scale + bias)
        return h.reshape(S, 9 * MID) @ k1.reshape(9 * MID, OUT)

    def gather_patches_rows(x, bt, yy, xx, r):
        # the corner-gather pattern (bilinear.py:174): flat [R, C] row
        # gathers with fancy indexing — the fast gather path on TPU
        btn, hh, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
        kk = 2 * r + 1
        flat = xp.reshape(btn * (hh + 2 * r) * (ww + 2 * r), c)
        base = (bt * (hh + 2 * r) + yy) * (ww + 2 * r) + xx
        off = (jnp.arange(kk)[:, None] * (ww + 2 * r)
               + jnp.arange(kk)[None, :]).reshape(-1)
        idx = base[:, None] + off[None, :]  # [S, kk*kk]
        return flat[idx].reshape(S, kk, kk, c)

    def gather_patches_rows3(x, bt, yy, xx, r):
        # contiguous 1x(kk*C) row windows from a [R, kk*C]-reshaped view:
        # kk row-gathers per sample instead of kk*kk, each 3 pixels wide.
        # Only exact when xx is a multiple of kk... NOT exact in general —
        # measured for the gather cost shape only.
        btn, hh, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
        kk = 2 * r + 1
        wp = ww + 2 * r
        # pad wp to multiple of kk
        wq = ((wp + kk - 1) // kk) * kk
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wq - wp), (0, 0)))
        flat = xp.reshape(btn * (hh + 2 * r) * (wq // kk), kk * c)
        base = (bt * (hh + 2 * r) + yy) * (wq // kk) + xx // kk
        off = jnp.arange(kk)[None, :] * (wq // kk)
        idx = base[:, None] + off  # [S, kk]
        return flat[idx].reshape(S, kk, kk, c)

    def sparse_rows(x, k0, k1):
        p = gather_patches_rows(x, bt, yy, xx, 2)
        cols = jnp.stack(
            [p[:, dy:dy + 3, dx:dx + 3].reshape(S, -1)
             for dy in range(3) for dx in range(3)], axis=1
        )
        h = cols @ k0.reshape(9 * C, MID)
        h = jax.nn.relu(h * scale + bias)
        return h.reshape(S, 9 * MID) @ k1.reshape(9 * MID, OUT)

    # ---- s2d formulation: conv0 dense in s2d (fast), conv1 sparse ----
    # conv0 output lives as a padded s2d map [BT, 146, 146, 4*MID]; the
    # 3x3 full-res window of a sample spans a 2x2 s2d cell block -> 4
    # row gathers of 256-wide rows per sample, then a parity select.
    hs = H // 2 + 2
    xs2d = jax.random.normal(k, (BT, hs, hs, 4 * MID), jnp.bfloat16)

    def sparse_s2d_conv1(xs, k1):
        flat = xs.reshape(BT * hs * hs, 4 * MID)
        cy0 = (yy - 1) // 2 + 1
        cx0 = (xx - 1) // 2 + 1
        base = (bt * hs + cy0) * hs + cx0
        off = (jnp.arange(2)[:, None] * hs + jnp.arange(2)[None, :]).reshape(-1)
        blk = flat[base[:, None] + off[None, :]]  # [S, 4, 4*MID]
        # s2d channels = [sy*2+sx] blocks of MID
        blk = blk.reshape(S, 2, 2, 2, 2, MID)  # cy cx sy sx C
        blk = blk.transpose(0, 1, 3, 2, 4, 5).reshape(S, 4, 4, MID)
        oy = (yy - 1) % 2
        ox = (xx - 1) % 2
        win = jnp.zeros((S, 3, 3, MID), blk.dtype)
        for a in (0, 1):
            for c in (0, 1):
                m = ((oy == a) & (ox == c))[:, None, None, None]
                win = jnp.where(m, blk[:, a:a + 3, c:c + 3], win)
        return win.reshape(S, 9 * MID) @ k1.reshape(9 * MID, OUT)

    d = timeit(dense, x, k0, k1)
    s2 = timeit(sparse_im2col, x, k0, k1)
    sr = timeit(sparse_rows, x, k0, k1)
    ss = timeit(sparse_s2d_conv1, xs2d, k1)
    print(f"s2d sparse conv1 (gather+mm) {ss:8.1f} us")
    g = timeit(lambda x: gather_patches(x, bt, yy, xx, 2), x)
    gr = timeit(lambda x: gather_patches_rows(x, bt, yy, xx, 2), x)
    g3 = timeit(lambda x: gather_patches_rows3(x, bt, yy, xx, 2), x)
    print(f"dense 2-conv head            {d:8.1f} us")
    print(f"sparse im2col (dynslice)     {s2:8.1f} us")
    print(f"sparse im2col (row gathers)  {sr:8.1f} us")
    print(f"  dynslice windows alone     {g:8.1f} us")
    print(f"  25x row-gather alone       {gr:8.1f} us")
    print(f"  5x 3px-window rows alone   {g3:8.1f} us")


if __name__ == "__main__":
    main()
