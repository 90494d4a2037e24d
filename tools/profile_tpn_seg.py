"""Microbench: TPointNet segment-reduction strategies at bench shapes.

The alignment stage reduces S=16384 FG rows into tiny segment spaces
(frame slots G*T+1 = 129, instance slots G+1 = 33). Candidates:

  * scatter  — jax.ops.segment_{sum,max} (current, unsorted ids)
  * sorted   — same with indices_are_sorted=True (requires key-sorted rows)
  * matmul   — one-hot [S, n_seg] @ data on the MXU (sum only)
  * argsort  — the cost of producing the sorted order for 16k keys

Run: python tools/profile_tpn_seg.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

S, NSEG, NINST = 16384, 129, 33
_HI = jax.lax.Precision.HIGHEST


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
        dt = ((t2 - t1) - (t1 - t0)) / iters * 1e6
        best = dt if best is None else min(best, dt)
    return best


def main():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    seg = jax.random.randint(k1, (S,), 0, NSEG, dtype=jnp.int32)
    seg_sorted = jnp.sort(seg)
    for c in (4, 129, 257):
        data = jax.random.normal(k2, (S, c), jnp.float32)

        t_sum = timeit(
            lambda d, s: jax.ops.segment_sum(d, s, num_segments=NSEG), data, seg
        )
        t_sum_s = timeit(
            lambda d, s: jax.ops.segment_sum(
                d, s, num_segments=NSEG, indices_are_sorted=True
            ),
            data, seg_sorted,
        )

        def mm(d, s):
            oh = (s[:, None] == jnp.arange(NSEG)[None]).astype(d.dtype)
            return jax.lax.dot_general(
                oh, d, (((0,), (0,)), ((), ())), precision=_HI
            )

        t_mm = timeit(mm, data, seg)

        def mm_bf(d, s):
            oh = (s[:, None] == jnp.arange(NSEG)[None]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, d.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        t_mmb = timeit(mm_bf, data, seg)

        t_max = timeit(
            lambda d, s: jax.ops.segment_max(d, s, num_segments=NSEG), data, seg
        )
        t_max_s = timeit(
            lambda d, s: jax.ops.segment_max(
                d, s, num_segments=NSEG, indices_are_sorted=True
            ),
            data, seg_sorted,
        )
        print(
            f"C={c:4d}  sum {t_sum:7.1f}  sum_sorted {t_sum_s:7.1f}  "
            f"mm_f32 {t_mm:7.1f}  mm_bf16 {t_mmb:7.1f}  "
            f"max {t_max:7.1f}  max_sorted {t_max_s:7.1f}  us"
        )

    keys = jax.random.randint(k3, (1, S), 0, NSEG, dtype=jnp.int32)
    t_argsort = timeit(lambda kk: jnp.argsort(kk, axis=1), keys)
    t_sortpair = timeit(
        lambda kk: jax.lax.sort(
            (kk, jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], kk.shape)),
            dimension=1, num_keys=1,
        )[1],
        keys,
    )
    print(f"argsort [1,{S}] {t_argsort:7.1f} us   lax.sort pair {t_sortpair:7.1f} us")


if __name__ == "__main__":
    main()
