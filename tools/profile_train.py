"""Training-step cost breakdown on the chip.

Round-3 target (PROFILE_r02.md): the train:val ratio is ~10x at Waymo
scale (152 ms train vs 14.9 ms val) where ~3x would be expected. This
script times, at a chosen shape preset:

  1. val forward                      (baseline)
  2. train-mode forward (no grad)     (BN mutation + train-mode branches)
  3. fwd + fuse_loss (no grad)
  4. value_and_grad of (3)
  5. (4) + optax update = full step
  6. optionally the same under remat policies

Usage: python tools/profile_train.py [bench|waymo] [B] [--remat=policy]
  policy in {none, full, dots}
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import bench_cfg, make_batch
from pcaccumulation_tpu.config import derive, load_config
from pcaccumulation_tpu.data.dataset import prep_sample
from pcaccumulation_tpu.data.loader import collate
from pcaccumulation_tpu.data.synthetic import generate_sample
from pcaccumulation_tpu.models import MotionNet
from pcaccumulation_tpu.train.loss import fuse_loss
from pcaccumulation_tpu.train.trainer import make_optimizer


def waymo_cfg(batch_size: int = 1):
    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-36, -36, -2, 36, 36, 6], "voxel_size": [0.25, 0.25, 8],
         "n_sweeps": 5, "crop_range": [32, -2, 6]}
    )
    cfg["data"].update({"n_frames": 5, "freq": 10.0, "max_speed": 30,
                        "ground_height": 0.04})
    cfg["capacity"] = {"max_points": 90000, "max_pillars": 30000,
                       "max_instances": 32, "max_fg_points": 16384}
    cfg["tpointnet"]["n_iterations"] = 2
    cfg["precision"]["compute_dtype"] = "bfloat16"
    cfg["cluster"]["max_cluster_points"] = 8192
    return derive(cfg)


def time_fn(fn, args, n1=3, n2=10):
    """Chained-loop differencing timer. The LAST positional arg must be the
    batch dict: its "points" leaf is perturbed by i*1e-12 each iteration
    (numerically inert, but formally loop-variant) — without it XLA's
    while-loop LICM hoists the whole body and the timer reads ~0
    (bench.py learned this the hard way; same defeat here)."""

    def many(n, *a):
        def body(i, carry):
            acc, aa = carry
            batch = dict(aa[-1])
            batch["points"] = batch["points"] + (i * jnp.float32(1e-12))
            out = fn(*aa[:-1], batch)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                    if hasattr(x, "astype"))
            return (acc + s, aa)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), a))[0]

    many_jit = jax.jit(many)
    float(many_jit(jnp.int32(n1), *args))
    float(many_jit(jnp.int32(n2), *args))
    t0 = time.perf_counter()
    float(many_jit(jnp.int32(n1), *args))
    t1 = time.perf_counter()
    float(many_jit(jnp.int32(n2), *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "bench"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    remat = "none"
    for a in sys.argv[3:]:
        if a.startswith("--remat="):
            remat = a.split("=", 1)[1]

    if preset == "waymo":
        cfg = waymo_cfg(batch_size)
        nf, np_, ppc, ppo = 5, 1100, 1100, 600
    else:
        cfg = bench_cfg(batch_size)
        nf, np_, ppc, ppo = 4, 900, 900, 500

    samples = []
    for i in range(batch_size):
        data = generate_sample(
            seed=i, n_frames=nf, freq=10.0, n_static_clusters=40,
            n_dynamic=6, pts_per_cluster=ppc, pts_per_object=ppo, area=30.0,
            ground_height=0.04,
        )
        samples.append(prep_sample(data, cfg, augment=False))
    batch = collate(samples)
    jbatch = jax.tree.map(jnp.asarray, batch)

    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    loss_w = cfg["loss"]
    max_inst = cfg["capacity"]["max_instances"]
    rng = jax.random.key(7)

    print(f"preset={preset} B={batch_size} remat={remat} "
          f"T={cfg['voxel_generator']['n_sweeps']} "
          f"N={cfg['capacity']['max_points']} "
          f"M={cfg['capacity']['max_pillars']}", flush=True)

    # 1. val forward
    def val_fwd(p, bs, b):
        return model.apply({"params": p, "batch_stats": bs}, b,
                           train=False, mode="val",
                           rngs={"sample": rng})["rec_est"]

    t = time_fn(val_fwd, (params, batch_stats, jbatch))
    print(f"val forward             {t*1e3:8.2f} ms", flush=True)

    # 2. train forward (mutable BN)
    def train_fwd(p, bs, b):
        out, _ = model.apply({"params": p, "batch_stats": bs}, b,
                             train=True, mode="train",
                             rngs={"sample": rng}, mutable=["batch_stats"])
        return out["rec_est"]

    t = time_fn(train_fwd, (params, batch_stats, jbatch))
    print(f"train forward           {t*1e3:8.2f} ms", flush=True)

    # 3. fwd + loss
    def loss_fn(p, bs, b):
        out, mut = model.apply({"params": p, "batch_stats": bs}, b,
                               train=True, mode="train",
                               rngs={"sample": rng}, mutable=["batch_stats"])
        stats = fuse_loss(out, b, loss_w, max_inst)
        return stats["loss"], mut["batch_stats"]

    t = time_fn(lambda p, bs, b: loss_fn(p, bs, b)[0],
                (params, batch_stats, jbatch))
    print(f"fwd + fuse_loss         {t*1e3:8.2f} ms", flush=True)

    # 4. grad
    base = loss_fn
    if remat == "full":
        base = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.nothing_saveable
        )
    elif remat == "dots":
        base = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def grad_fn(p, bs, b):
        (l, nbs), g = jax.value_and_grad(base, has_aux=True)(p, bs, b)
        return l, g

    t = time_fn(lambda p, bs, b: grad_fn(p, bs, b)[1],
                (params, batch_stats, jbatch))
    print(f"fwd + loss + grad       {t*1e3:8.2f} ms", flush=True)

    # 5. full step with optax update
    cfg["train"]["iter_size"] = 1
    tx, _ = make_optimizer(cfg, 100)
    opt_state = tx.init(params)

    def full_step(p, bs, os_, b):
        (l, nbs), g = jax.value_and_grad(base, has_aux=True)(p, bs, b)
        updates, os2 = tx.update(g, os_, p)
        import optax

        p2 = optax.apply_updates(p, updates)
        return p2

    t = time_fn(lambda p, bs, os_, b: full_step(p, bs, os_, b),
                (params, batch_stats, opt_state, jbatch))
    print(f"full train step         {t*1e3:8.2f} ms "
          f"({batch_size/t:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
