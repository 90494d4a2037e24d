"""STPN temporal-conv formulations at nuScenes T=11: parity + microbench.

PROFILE_r07 traced the 4 STPN banded convs at 4.73 ms of the 38.5 ms
T=11 forward. The banded [3,3,TC,TC] kernel runs at ~154 TF/s but only
31 of 121 T-blocks are nonzero (74% structural-zero FLOPs at T=11 vs
33% at T=4, where the fold was measured and won). Useful-FLOP floor for
the 4-layer chain is ~1.0 ms — up to ~3.7 ms is structurally
recoverable. Candidates, all mathematically identical to the Conv3d:

  banded   [B,H,W,TC] conv [3,3,TC,TC] block-banded        (current)
  shift    [B*T,H,W,C] conv [3,3,C,3C] (three stacked K[dt]) then
           out[to] = y0[to-1] + y1[to] + y2[to+1]           (no zeros,
           96/128 lanes, extra activation bandwidth for the combine)
  window   groups of G=4 frames + 1-frame halo: [B*G',H,W,6C] conv
           [3,3,6C,4C] banded (50% useful, 128/128 lanes)

Run: python tools/profile_stpn_t11.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

DN = ("NHWC", "HWIO", "NHWC")
B, T, H, W, C = 1, 11, 288, 288, 32
DTYPE = jnp.bfloat16


def banded_kernel(k, t):
    c = k.shape[-1]
    big = jnp.zeros((3, 3, t * c, t * c), k.dtype)
    for to in range(t):
        for dt in (-1, 0, 1):
            ti = to + dt
            if 0 <= ti < t:
                big = big.at[:, :, ti * c:(ti + 1) * c,
                             to * c:(to + 1) * c].set(k[dt + 1])
    return big


def conv(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=DN)


def chain_banded(x, ks):
    # x [B, H, W, T*C]
    for k in ks:
        x = jax.nn.relu(conv(x, banded_kernel(k, T)))
    return x


def chain_shift(x, ks):
    # x [B, H, W, T*C] -> per-frame batch [B*T, H, W, C]
    b, h, w, _ = x.shape
    xf = x.reshape(b, h, w, T, C).transpose(0, 3, 1, 2, 4).reshape(
        b * T, h, w, C)
    for k in ks:
        # stacked kernel [3,3,C,3C]: y[..., j*C:(j+1)*C] = K[j] * in
        kk = jnp.concatenate([k[0], k[1], k[2]], axis=-1)
        y = conv(xf, kk).reshape(b, T, h, w, 3 * C)
        z = jnp.zeros((b, 1, h, w, C), y.dtype)
        # out[to] = y0[to-1] + y1[to] + y2[to+1]
        xf = jax.nn.relu(
            jnp.concatenate([z, y[:, :-1, :, :, :C]], axis=1)
            + y[:, :, :, :, C:2 * C]
            + jnp.concatenate([y[:, 1:, :, :, 2 * C:], z], axis=1)
        ).reshape(b * T, h, w, C)
    return xf.reshape(b, T, h, w, C).transpose(0, 2, 3, 1, 4).reshape(
        b, h, w, T * C)


def window_kernel(k, g=4):
    # in g+2 frames (1 halo each side), out g frames: [3,3,(g+2)C,gC]
    c = k.shape[-1]
    big = jnp.zeros((3, 3, (g + 2) * c, g * c), k.dtype)
    for to in range(g):
        for dt in (-1, 0, 1):
            ti = to + 1 + dt
            big = big.at[:, :, ti * c:(ti + 1) * c,
                         to * c:(to + 1) * c].set(k[dt + 1])
    return big


def chain_window(x, ks, g=4):
    b, h, w, _ = x.shape
    ng = -(-T // g)  # 3 groups at T=11 (last padded)
    xf = x.reshape(b, h, w, T, C)
    for k in ks:
        kw = window_kernel(k, g)
        pad = jnp.zeros((b, h, w, 1, C), xf.dtype)
        padded = jnp.concatenate(
            [pad, xf] + [pad] * (ng * g - T + 1), axis=3)  # [b,h,w,ng*g+2,C]
        wins = [
            padded[:, :, :, gi * g:gi * g + g + 2].reshape(b, h, w, (g + 2) * C)
            for gi in range(ng)
        ]
        xin = jnp.concatenate(wins, axis=0)  # [b*ng, h, w, (g+2)C]
        y = jax.nn.relu(conv(xin, kw))  # [b*ng, h, w, gC]
        xf = jnp.concatenate(
            [y[gi * b:(gi + 1) * b] for gi in range(ng)], axis=-1
        ).reshape(b, h, w, ng * g, C)[:, :, :, :T]
    return xf.reshape(b, h, w, T * C)


def time_fn(fn, x, ks, n1=5, n2=55):
    def many(x, n):
        def body(i, acc):
            jitter = (i.astype(jnp.float32) * 1e-12).astype(x.dtype)
            return acc + jnp.sum(fn(x + jitter, ks)).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    step = jax.jit(many)
    float(step(x, jnp.int32(2)))  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(x, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(step(x, jnp.int32(n2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        best = dt if best is None else min(best, dt)
    return best / (n2 - n1)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, T * C)).astype(np.float32),
                    dtype=DTYPE)
    ks = [jnp.asarray(rng.normal(size=(3, 3, 3, C, C)).astype(np.float32)
                      * 0.05, dtype=DTYPE) for _ in range(4)]

    # parity first (f32 at highest matmul precision — the formulations
    # contract in different orders, so default TPU conv precision shows
    # ~1e-3 noise; highest shows true algorithmic parity)
    xs = x[:, :64, :64].astype(jnp.float32)
    kf = [k.astype(jnp.float32) for k in ks]
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(chain_banded)(xs, kf))
        for name, f in [("shift", chain_shift), ("window", chain_window)]:
            out = np.asarray(jax.jit(f)(xs, kf))
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"parity {name}: max rel err {err:.2e}")
            assert err < 1e-4, name

    for name, f in [("banded", chain_banded), ("shift", chain_shift),
                    ("window", chain_window)]:
        dt = time_fn(f, x, ks)
        print(f"{name:8s}: {dt * 1e3:.3f} ms  (4-layer chain, T=11 288^2 bf16)",
              flush=True)
