"""Microbench: BEV pillar scatter variants at bench shapes.

The traced val forward spends ~468 us in the canvas scatter
(f32 [size,34] rows) plus ~226 us converting the dense canvas to bf16
(PROFILE: fusion.42 + convert.85).  Candidates:

  a) current: scatter f32 rows, then convert canvas to bf16
  b) pair-packed: bitcast bf16 channel pairs into f32 words, scatter 17
     f32 channels, bitcast the dense canvas back to bf16 — halves both
     the scatter's canvas bytes and the convert's input bytes
  c) bf16 row scatter directly (expected slow: sub-word writes)

Run: python tools/profile_scatter_pack.py

VERDICT (v5e, 2026-08): in ISOLATION (this file) packed/bf16 win:
current 2277 us, pair-packed 1394 us, bf16-direct 1292 us.  IN SITU the
ranking inverts: bench seq/s = 79.7 (f32+convert) > 76.3 (bf16 direct)
> 73.1 (pair-packed).  In the full graph XLA lays the canvas out
channel-major [34, THW] to suit the conv consumers and fuses the convert;
the isolated row-major layout does not transfer, and the bitcasts pin
layouts that force extra copies.  The f32 scatter + dense convert stays.

Also ruled out IN SITU: a scatter->gather reformulation (scatter an int32
cell->pillar map, then materialise the canvas as a bf16 row gather with a
custom injective-map VJP) — 71.1 seq/s: the gather writing the
channel-major canvas layout pays the same write amplification as the wide
scatter, plus the extra int map pass.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

M = 25600          # padded pillar capacity
C = 34             # feature channels + occupancy + fb gt
SIZE = 4 * 288 * 288


def timeit(fn, *args, iters=60):
    """Chain N iterations inside ONE jitted fori_loop (the axon tunnel makes
    per-dispatch timing useless — see bench.py); difference two run lengths
    to cancel the constant overhead."""
    def chained(n, feats, ix, v):
        def body(i, carry):
            out, acc = fn(feats + carry.astype(feats.dtype) * 0, ix, v)
            return acc.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    run = jax.jit(chained, static_argnums=0)
    for n in (2, 2 + iters):
        float(run(n, *args))  # warm both compiles
    t0 = time.perf_counter(); float(run(2, *args)); t1 = time.perf_counter()
    float(run(2 + iters, *args)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(M, C)), jnp.bfloat16)
    idx_np = np.sort(rng.choice(SIZE, size=M, replace=False))
    idx = jnp.asarray(idx_np, jnp.int32)
    valid = jnp.asarray(rng.random(M) < 25000 / M)

    @jax.jit
    def current(f, ix, v):
        ix = jnp.where(v, ix, SIZE)
        canvas = jnp.zeros((SIZE, C), jnp.float32)
        canvas = canvas.at[ix].set(f.astype(jnp.float32), mode="drop",
                                   unique_indices=True)
        out = canvas.astype(jnp.bfloat16)
        return out, out.sum()

    @jax.jit
    def packed(f, ix, v):
        ix = jnp.where(v, ix, SIZE)
        words = jax.lax.bitcast_convert_type(
            f.reshape(M, C // 2, 2), jnp.float32)          # [M, 17]
        canvas = jnp.zeros((SIZE, C // 2), jnp.float32)
        canvas = canvas.at[ix].set(words, mode="drop", unique_indices=True)
        out = jax.lax.bitcast_convert_type(canvas, jnp.bfloat16)
        out = out.reshape(SIZE, C)                         # [SIZE, 17, 2] ->
        return out, out.sum()

    @jax.jit
    def bf16_direct(f, ix, v):
        ix = jnp.where(v, ix, SIZE)
        canvas = jnp.zeros((SIZE, C), jnp.bfloat16)
        canvas = canvas.at[ix].set(f, mode="drop", unique_indices=True)
        return canvas, canvas.sum()

    # parity: packed == current exactly (same bf16 bits)
    a = current(feats, idx, valid)[0]
    b = packed(feats, idx, valid)[0]
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    print("parity OK")

    for name, fn in [("current f32+convert", current),
                     ("pair-packed f32", packed),
                     ("bf16 direct", bf16_direct)]:
        print(f"{name:22s} {timeit(fn, feats, idx, valid):8.1f} us")


if __name__ == "__main__":
    main()
