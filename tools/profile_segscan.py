"""Real-chip microbench: sorted-segment pooling — scatter vs Pallas scans.

Compares the PillarFeatureNet local-pool op (segment_max + gather-back,
ops/segment.py) against the two-pass Pallas segmented scan
(kernels/segscan.py) at production shapes, fwd and fwd+bwd.

Run: python tools/profile_segscan.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_components import time_fn
from pcaccumulation_tpu.kernels.segscan import seg_pool
from pcaccumulation_tpu.ops.segment import masked_segment_max


def make_ids(n, m, seed=0):
    """Sorted ids with the bench-shape run-length profile (mean n/m)."""
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, m, size=n)).astype(np.int32)
    return jnp.asarray(ids)


def main():
    n, m, c = 60000, 25000, 32
    dtype = jnp.bfloat16
    ids = make_ids(n, m)
    valid = jnp.asarray(np.random.default_rng(1).random(n) < 0.97)
    x = jax.random.normal(jax.random.key(0), (n, c)).astype(dtype)
    nseg = m + 1

    def pool_scatter(xx):
        p = masked_segment_max(xx, ids, valid, nseg, indices_are_sorted=True)
        return p[ids]

    def pool_scan(xx, rblk=1024):
        mskd = jnp.where(valid[:, None], xx, jnp.asarray(-1e30, xx.dtype))
        y = seg_pool(mskd, ids, "max", rblk)
        return jnp.where(y <= -0.5e30, jnp.zeros_like(y), y)

    def grad_of(pool):
        def loss(xx):
            return jnp.sum(pool(xx).astype(jnp.float32) * xx.astype(jnp.float32))
        return jax.grad(loss)

    print(f"N={n} M={m} C={c} {dtype.__name__}", flush=True)
    for name, fn in [
        ("pool scatter fwd", pool_scatter),
        ("pool scan  fwd r512", lambda xx: pool_scan(xx, 512)),
        ("pool scan  fwd r1024", lambda xx: pool_scan(xx, 1024)),
        ("pool scan  fwd r2048", lambda xx: pool_scan(xx, 2048)),
        ("pool scatter fwd+bwd", grad_of(pool_scatter)),
        ("pool scan  fwd+bwd r1024", grad_of(lambda xx: pool_scan(xx, 1024))),
    ]:
        try:
            dt = time_fn(fn, (x,))
            print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — report compile failures
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)

    # parity on-chip
    a = pool_scatter(x.astype(jnp.float32))
    b = pool_scan(x.astype(jnp.float32))
    print("fwd parity max err:", float(jnp.max(jnp.abs(a - b))))
    ga = grad_of(pool_scatter)(x.astype(jnp.float32))
    gb = grad_of(pool_scan)(x.astype(jnp.float32))
    print("bwd parity max err:", float(jnp.max(jnp.abs(ga - gb))))


if __name__ == "__main__":
    main()
