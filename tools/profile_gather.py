"""Microbenchmark the FG-subset gather/scatter patterns on the real chip.

Measures the exact shapes used by MotionNet's FG-subset machinery
(motionnet.py:331,425): row gathers of narrow per-point arrays
([N,3] f32 points, [N] s32 labels) with sorted unique indices, plus
packing alternatives. Timing per tpu-timing-pitfalls: n-iter fori_loop
with per-iteration input perturbation, difference two run lengths.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N = 60000
S = 16384


def timeit(fn, *args, iters=400, warm=40):
    """Time fn(*args) per-iteration via loop-length differencing."""

    def loop(n, args):
        def body(i, a):
            out = fn(*a)
            # perturb: fold a data-dependent epsilon back into arg 0
            leaf = jax.tree.leaves(out)[0]
            eps = (leaf.ravel()[0].astype(jnp.float32) * 1e-20).astype(
                args[0].dtype
            )
            return (args[0] + eps,) + a[1:]

        return jax.lax.fori_loop(0, n, body, args)[0].ravel()[0]

    jl = jax.jit(loop, static_argnums=0)
    # block_until_ready does NOT block through the device tunnel — fetch
    # the scalar (see tpu-timing-pitfalls)
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
    pts = jax.random.normal(k, (1, N, 3), jnp.float32)
    lab = jax.random.randint(k, (1, N), 0, 40, jnp.int32)
    sel = jnp.sort(
        jax.random.permutation(k, jnp.arange(N, dtype=jnp.int32))[:S]
    )[None]

    def t_take_pts(p, s):
        return jnp.take_along_axis(p, s[..., None], axis=1)

    def t_vmap_pts(p, s):
        return jax.vmap(lambda a, i: a[i])(p, s)

    def t_take_lab(l, s):
        return jnp.take_along_axis(l, s, axis=1)

    # packed: 3 coords + 1 label in a [N, 4] f32 row (bitcast label)
    packed = jnp.concatenate(
        [pts, jax.lax.bitcast_convert_type(lab, jnp.float32)[..., None]],
        axis=-1,
    )

    def t_take_packed(p, s):
        return jnp.take_along_axis(p, s[..., None], axis=1)

    # transposed layout: [3, N], gather along minor dim
    pts_t = pts.transpose(0, 2, 1)

    def t_take_t(p, s):
        return jnp.take_along_axis(p, s[:, None, :], axis=2)

    # flat interleaved: [N*3] with indices i*3+k
    pts_flat = pts.reshape(1, N * 3)

    def t_take_flat(p, s):
        ix = (s[..., None] * 3 + jnp.arange(3)[None, None]).reshape(1, S * 3)
        return jnp.take_along_axis(p, ix, axis=1).reshape(1, S, 3)

    print(f"[1,{N},3] f32 take_along_axis      {timeit(t_take_pts, pts, sel):8.1f} us")
    print(f"[1,{N},3] f32 vmap a[i]            {timeit(t_vmap_pts, pts, sel):8.1f} us")
    print(f"[1,{N}]   s32 take_along_axis      {timeit(t_take_lab, lab, sel):8.1f} us")
    print(f"[1,{N},4] f32 packed row gather    {timeit(t_take_packed, packed, sel):8.1f} us")
    print(f"[1,3,{N}] f32 minor-dim gather     {timeit(t_take_t, pts_t, sel):8.1f} us")
    print(f"[1,{N}*3] f32 flat interleaved     {timeit(t_take_flat, pts_flat, sel):8.1f} us")

    # the put_rows scatter pattern (motionnet.py:341)
    base = jnp.zeros((1, N, 2), jnp.float32)
    sub = jax.random.normal(k, (1, S, 2), jnp.float32)

    def t_put(b, s, u):
        return jax.vmap(
            lambda bb, ii, uu: bb.at[ii].set(uu, mode="drop",
                                             unique_indices=True)
        )(b, s, u)

    print(f"[1,{N},2] put_rows scatter         {timeit(t_put, base, sel, sub):8.1f} us")


if __name__ == "__main__":
    main()
