"""Microbench: per-point BEV ungrid gather strategies at bench shapes.

backbone_pp ungrids the folded bf16 canvas [288,288,128] at S=16384 points
with a per-point frame id (narrow [S,32] row gathers from the [331776,32]
view), and mos_pp ungrids the [288,288,64] motion map at the same points.
Variants:

  A current   — 4 corner gathers x [S,32] (temporal) + 4 x [S,64] (mos)
  B wide      — 4 x [S,128] full-row gathers + t-block select, + mos as-is
  C fused     — concat maps to [288,288,192]; 4 x [S,192] gathers, split

Run: python tools/profile_ungrid.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

H = W = 288
T, C, CM = 4, 32, 64
S = 16384


def timeit(fn, *args, iters=200, warm=20):
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
        best_ = ((t2 - t1) - (t1 - t0)) / iters * 1e6
        best = best_ if best is None else min(best, best_)
    return best


def corners(xy):
    x = (xy[:, 0] + 1.0) * (W * 0.5) - 0.5
    y = (xy[:, 1] + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    tx = (x - x0)[:, None]
    ty = (y - y0)[:, None]
    return x0, y0, tx, ty


def lerp(v00, v01, v10, v11, tx, ty):
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def run_a(canvas, mos, xy, tid):
    x0, y0, tx, ty = corners(xy)
    flat = canvas.reshape(H * W * T, C)

    def g(yi, xi):
        return flat[(yi * W + xi) * T + tid]

    bb = lerp(g(y0, x0), g(y0, x0 + 1), g(y0 + 1, x0), g(y0 + 1, x0 + 1), tx, ty)
    mf = mos.reshape(H * W, CM)

    def gm(yi, xi):
        return mf[yi * W + xi]

    mm = lerp(gm(y0, x0), gm(y0, x0 + 1), gm(y0 + 1, x0), gm(y0 + 1, x0 + 1), tx, ty)
    return bb, mm


def run_b(canvas, mos, xy, tid):
    x0, y0, tx, ty = corners(xy)
    flat = canvas.reshape(H * W, T * C)

    def g(yi, xi):
        rows = flat[yi * W + xi].reshape(S, T, C)
        return jnp.take_along_axis(rows, tid[:, None, None], axis=1)[:, 0]

    bb = lerp(g(y0, x0), g(y0, x0 + 1), g(y0 + 1, x0), g(y0 + 1, x0 + 1), tx, ty)
    mf = mos.reshape(H * W, CM)

    def gm(yi, xi):
        return mf[yi * W + xi]

    mm = lerp(gm(y0, x0), gm(y0, x0 + 1), gm(y0 + 1, x0), gm(y0 + 1, x0 + 1), tx, ty)
    return bb, mm


def run_c(canvas, mos, xy, tid):
    x0, y0, tx, ty = corners(xy)
    both = jnp.concatenate(
        [canvas.reshape(H * W, T * C), mos.reshape(H * W, CM)], axis=-1
    )

    def g(yi, xi):
        rows = both[yi * W + xi]
        sel = rows[:, : T * C].reshape(S, T, C)
        bb = jnp.take_along_axis(sel, tid[:, None, None], axis=1)[:, 0]
        return bb, rows[:, T * C:]

    b00, m00 = g(y0, x0)
    b01, m01 = g(y0, x0 + 1)
    b10, m10 = g(y0 + 1, x0)
    b11, m11 = g(y0 + 1, x0 + 1)
    return lerp(b00, b01, b10, b11, tx, ty), lerp(m00, m01, m10, m11, tx, ty)


def main():
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    canvas = jax.random.normal(k1, (H, W, T * C), jnp.bfloat16)
    mos = jax.random.normal(k2, (H, W, CM), jnp.bfloat16)
    xy = jax.random.uniform(k3, (S, 2), jnp.float32, -0.95, 0.95)
    tid = jax.random.randint(k4, (S,), 0, T, dtype=jnp.int32)

    for name, fn in (("A current", run_a), ("B wide", run_b), ("C fused", run_c)):
        t = timeit(fn, canvas, mos, xy, tid)
        print(f"{name:10s} {t:8.1f} us")

    ra = run_a(canvas, mos, xy, tid)
    for name, fn in (("B", run_b), ("C", run_c)):
        rr = fn(canvas, mos, xy, tid)
        d = max(
            float(jnp.max(jnp.abs(ra[0].astype(jnp.float32) - rr[0].astype(jnp.float32)))),
            float(jnp.max(jnp.abs(ra[1].astype(jnp.float32) - rr[1].astype(jnp.float32)))),
        )
        print(f"max |A - {name}| = {d:.2e}")


if __name__ == "__main__":
    main()
