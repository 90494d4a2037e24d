"""Post-UNet fold ([B*T,H,W,C] t-major -> [B,H,W,T*C] t-minor) at T=11.

PROFILE_r07: the fold transpose traced at 1.19 ms in the T=11 val
forward (motionnet.py bevf) — ~8x over the ~0.14 ms bandwidth floor for
58 MB bf16. Variants:

  transpose   reshape(b,t,h,w,c).transpose(0,2,3,1,4).reshape   (current)
  concat      jnp.concatenate([x[:, ti] for ti in T], axis=-1)
  dus         lane dynamic-update-slices into a preallocated buffer

Run: python tools/profile_fold_t11.py
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

B, T, H, W, C = 1, 11, 288, 288, 32
DTYPE = jnp.bfloat16


def fold_transpose(x):  # x [B*T, H, W, C]
    return (x.reshape(B, T, H, W, C).transpose(0, 2, 3, 1, 4)
            .reshape(B, H, W, T * C))


def fold_concat(x):
    xr = x.reshape(B, T, H, W, C)
    return jnp.concatenate([xr[:, ti] for ti in range(T)], axis=-1)


def fold_dus(x):
    xr = x.reshape(B, T, H, W, C)
    out = jnp.zeros((B, H, W, T * C), x.dtype)
    for ti in range(T):
        out = jax.lax.dynamic_update_slice_in_dim(
            out, xr[:, ti], ti * C, axis=3)
    return out


def time_fn(fn, x, n1=10, n2=110):
    def many(x, n):
        def body(i, acc):
            jit = (i.astype(jnp.float32) * 1e-12).astype(x.dtype)
            return acc + jnp.sum(fn(x + jit)).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    step = jax.jit(many)
    float(step(x, jnp.int32(2)))
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
    x = jnp.asarray(rng.normal(size=(B * T, H, W, C)).astype(np.float32),
                    dtype=DTYPE)
    ref = np.asarray(jax.jit(fold_transpose)(x))
    for name, f in [("concat", fold_concat), ("dus", fold_dus)]:
        np.testing.assert_array_equal(np.asarray(jax.jit(f)(x)), ref)
    print("parity ok")
    for name, f in [("transpose", fold_transpose), ("concat", fold_concat),
                    ("dus", fold_dus)]:
        print(f"{name:10s}: {time_fn(f, x) * 1e3:.3f} ms", flush=True)
