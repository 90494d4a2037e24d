"""Micro-benchmark: vmapped vs batch-flattened scatter/gather at B=1..8.

Round-3 batch-scaling investigation. The round-2 profile (PROFILE_r02.md)
showed the vmapped BEV scatter's unique-indices fast path regressing at
B=4 (7.2 -> 15.1 ms) and the per-point gathers scaling superlinearly with
working-set size. Hypothesis: folding the batch dim into the row index
(one flat [B*S, C] scatter/gather) keeps XLA on the 1-D fast emitter at
every batch size.

Run: python tools/profile_batch_ops.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

T, H, W, C = 4, 288, 288, 32
M = 25000
N = 60000
SIZE = T * H * W


def time_fn(fn, args, n1=5, n2=20):
    def many(n, *a):
        def body(i, acc):
            pert = a[0] + (i * jnp.float32(1e-12)).astype(a[0].dtype)
            out = fn(pert, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    many_jit = jax.jit(many)
    float(many_jit(jnp.int32(n1), *args))
    float(many_jit(jnp.int32(n2), *args))
    t0 = time.perf_counter()
    float(many_jit(jnp.int32(n1), *args))
    t1 = time.perf_counter()
    float(many_jit(jnp.int32(n2), *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def make_inputs(b, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    feats = jax.random.normal(k1, (b, M, C), jnp.float32)
    # unique in-range indices per sample: random permutation prefix
    idx = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(k2, i), SIZE)[:M]
         for i in range(b)]
    ).astype(jnp.int32)
    valid = jax.random.uniform(k3, (b, M)) < 0.9
    canvas = jax.random.normal(k4, (b, SIZE, C), jnp.float32)
    return feats, idx, valid, canvas


def scatter_vmapped(feats, idx, valid):
    def one(f, i, v):
        i = jnp.where(v, i, SIZE)
        cv = jnp.zeros((SIZE, C), f.dtype)
        return cv.at[i].set(f, mode="drop", unique_indices=True)

    return jax.vmap(one)(feats, idx, valid)


def scatter_flat(feats, idx, valid):
    b = feats.shape[0]
    off = jnp.arange(b, dtype=jnp.int32)[:, None] * SIZE
    flat_idx = jnp.where(valid, idx + off, b * SIZE).reshape(-1)
    cv = jnp.zeros((b * SIZE, C), feats.dtype)
    out = cv.at[flat_idx].set(feats.reshape(-1, C), mode="drop",
                              unique_indices=True)
    return out.reshape(b, SIZE, C)


def gather_vmapped(canvas, idx, valid):
    out = jnp.take_along_axis(canvas, jnp.clip(idx, 0, SIZE - 1)[..., None],
                              axis=1)
    return out * valid[..., None]


def gather_flat(canvas, idx, valid):
    b = canvas.shape[0]
    off = jnp.arange(b, dtype=jnp.int32)[:, None] * SIZE
    flat_idx = (jnp.clip(idx, 0, SIZE - 1) + off).reshape(-1)
    out = canvas.reshape(b * SIZE, C)[flat_idx].reshape(b, M, C)
    return out * valid[..., None]


def ungrid_inputs(b, key):
    k1, k2, k3 = jax.random.split(key, 3)
    fm = jax.random.normal(k1, (b, T, H, W, C), jnp.float32)
    pts = jax.random.uniform(k2, (b, N, 2), minval=-30.0, maxval=30.0)
    tid = jax.random.randint(k3, (b, N), 0, T)
    return fm, pts, tid


def tungrid_vmapped(fm, pts, tid):
    from pcaccumulation_tpu.ops.bilinear import temporal_ungrid

    return jax.vmap(lambda f, p, t: temporal_ungrid(f, p, t, -36.0))(
        fm, pts, tid
    )


def tungrid_flat(fm, pts, tid):
    """Batch folded into the gather rows: one flat [B*T*H*W, C] canvas."""
    b = fm.shape[0]
    flat = fm.reshape(b * T * H * W, C)
    scale = 36.0
    u = pts[..., 0] / scale
    v = pts[..., 1] / scale
    x = (u + 1.0) * (W * 0.5) - 0.5
    y = (v + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = (jnp.arange(b, dtype=jnp.int32)[:, None] * (T * H * W)
            + tid.astype(jnp.int32) * (H * W))

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return flat[(base + yc * W + xc).reshape(-1)].reshape(b, N, C)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    return (
        v00 * ((1 - ty) * (1 - tx))[..., None]
        + v01 * ((1 - ty) * tx)[..., None]
        + v10 * (ty * (1 - tx))[..., None]
        + v11 * (ty * tx)[..., None]
    )


def main():
    key = jax.random.key(0)
    print(f"shapes: T={T} H={H} W={W} C={C} M={M} N={N}")
    for b in (1, 2, 4, 8):
        feats, idx, valid, canvas = make_inputs(b, key)
        t_sv = time_fn(scatter_vmapped, (feats, idx, valid))
        t_sf = time_fn(scatter_flat, (feats, idx, valid))
        t_gv = time_fn(gather_vmapped, (canvas, idx, valid))
        t_gf = time_fn(gather_flat, (canvas, idx, valid))
        fm, pts, tid = ungrid_inputs(b, key)
        t_uv = time_fn(tungrid_vmapped, (fm, pts, tid))
        t_uf = time_fn(tungrid_flat, (fm, pts, tid))
        print(
            f"B={b}: scatter vmap {t_sv*1e3:7.2f}  flat {t_sf*1e3:7.2f} | "
            f"gather vmap {t_gv*1e3:7.2f}  flat {t_gf*1e3:7.2f} | "
            f"tungrid vmap {t_uv*1e3:7.2f}  flat {t_uf*1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
