"""On-chip timing of the test-time clustering path (ops/cluster.py).

The test-mode trace (PROFILE_r12) attributes ~19 ms of the 50 ms serving
step to clustering, led by the DBSCAN propagation while-loop. This
harness times `cluster_moving_points` in isolation with bench.py's
chained-loop differencing at the production capacity (8192 voxel reps)
across a range of ACTUAL moving-rep counts — trained models mark a few
hundred to a couple thousand reps moving; random-init profiling
saturates the cap, which is the worst case.

Run: python tools/profile_cluster.py [--block=512] [--cap=8192]
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

from pcaccumulation_tpu.ops.cluster import cluster_moving_points


def make_inputs(n_moving: int, n_points: int = 120_000, seed: int = 0):
    """Synthetic anchor-frame cloud: `n_moving` points in a handful of
    dense blobs (what the mos head feeds the clusterer), the rest
    static/invalid."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-32, 32, (n_points, 3)).astype(np.float32)
    n_blobs = max(1, n_moving // 600)
    centers = rng.uniform(-25, 25, (n_blobs, 3)).astype(np.float32)
    which = rng.integers(0, n_blobs, n_moving)
    pts[:n_moving] = centers[which] + rng.normal(
        0, 0.8, (n_moving, 3)).astype(np.float32)
    moving = np.zeros(n_points, bool)
    moving[:n_moving] = True
    valid = np.ones(n_points, bool)
    offset = np.zeros((n_points, 2), np.float32)
    return (jnp.asarray(pts), jnp.asarray(offset), jnp.asarray(moving),
            jnp.asarray(valid))


def time_chained(fn, args, n1=3, n2=13, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(fn(*args, jnp.int32(n2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if best is None or dt < best:
            best = dt
    return best / (n2 - n1)


def main():
    block, cap = 512, 8192
    for a in sys.argv[1:]:
        if a.startswith("--block="):
            block = int(a.split("=", 1)[1])
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])

    def many(pts, off, mov, val, n):
        def body(i, acc):
            labels = cluster_moving_points(
                pts + i * jnp.float32(1e-12), off, mov, val,
                max_cluster_points=cap,
            )
            return acc + jnp.sum(labels)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    step = jax.jit(many)
    print(f"cluster_moving_points cap={cap} block={block}")
    for n_moving in (512, 2048, 8192, 60000):
        args = make_inputs(n_moving)
        t0 = time.perf_counter()
        labels_n = int(step(*args, jnp.int32(1)))
        warm = time.perf_counter() - t0
        per = time_chained(step, args)
        print(f"  n_moving={n_moving:6d}: {per * 1e3:7.2f} ms "
              f"(warm {warm:.1f}s, label-sum {labels_n})")


if __name__ == "__main__":
    main()
