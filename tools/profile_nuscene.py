"""In-situ timing of production presets (default: nuScenes T=11, N=120k).

Times the FULL jitted val forward and (optionally) the full train step at
real config shapes with bench.py's chained-loop differencing
(per-dispatch host timing is meaningless through the device tunnel).
Variants are selected by CLI so A/B runs compile the real graph each sees
in production.

Run: python tools/profile_nuscene.py [--train|--test] [--preset=nuscene|bench|waymo]
                                     [--densify=scatter|gather]
                                     [--fold=transpose|concat]
                                     [--ungrid=folded|tmajor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from tools.trace_forward import nuscene_cfg, nuscene_batch
from pcaccumulation_tpu.models import MotionNet


def time_chained(step, args, n1=3, n2=23, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(step(*args, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(step(*args, jnp.int32(n2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if best is None or dt < best:
            best = dt
    return best / (n2 - n1)


def batched(batch_fn, cfg, n):
    """Collate n independently generated synthetic scenes."""
    if n == 1:
        return batch_fn(cfg)
    from pcaccumulation_tpu.data.dataset import prep_sample
    from pcaccumulation_tpu.data.loader import collate
    from pcaccumulation_tpu.data.synthetic import generate_sample

    t = cfg["voxel_generator"]["n_sweeps"]
    return collate([
        prep_sample(
            generate_sample(seed=i, n_frames=t, freq=20.0,
                            n_static_clusters=40, n_dynamic=6,
                            pts_per_cluster=900, pts_per_object=400,
                            area=30.0),
            cfg, augment=False,
        )
        for i in range(n)
    ])


def waymo_cfg():
    from pcaccumulation_tpu.config import derive, load_config

    cfg = load_config("configs/waymo.yaml")
    cfg["capacity"] = {"max_points": 90000, "max_pillars": 30000,
                       "max_instances": 48, "max_fg_points": 16384}
    cfg["precision"]["compute_dtype"] = "bfloat16"
    cfg["cluster"]["max_cluster_points"] = 8192
    return derive(cfg)


def main():
    train = "--train" in sys.argv
    # test mode = the serving graph: val forward + on-device clustering +
    # TPointNet/AlignNet instance reconstruction (what serve.Predictor jits)
    test_mode = "--test" in sys.argv
    densify, fold, ungrid_src, preset = "auto", "auto", "auto", "nuscene"
    band = 4
    for a in sys.argv[1:]:
        if a.startswith("--densify="):
            densify = a.split("=", 1)[1]
        if a.startswith("--fold="):
            fold = a.split("=", 1)[1]
        if a.startswith("--ungrid="):
            ungrid_src = a.split("=", 1)[1]
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
        if a.startswith("--band="):
            band = int(a.split("=", 1)[1])
    bsz = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            bsz = int(a.split("=", 1)[1])
    if preset == "bench":
        from bench import bench_cfg, make_batch

        cfg = bench_cfg(bsz)
        batch = make_batch(cfg, bsz)
    elif preset == "waymo":
        cfg = waymo_cfg()
        batch = batched(nuscene_batch, cfg, bsz)
    else:
        cfg = nuscene_cfg()
        batch = batched(nuscene_batch, cfg, bsz)
    cfg.setdefault("perf", {})["densify"] = densify
    cfg["perf"]["fold"] = fold
    cfg["perf"]["ungrid_src"] = ungrid_src
    cfg["stpn"]["n_band_layers"] = band
    jbatch = jax.tree.map(jnp.asarray, batch)
    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )

    label = f"densify={densify} fold={fold} ungrid={ungrid_src} band={band}"
    if not train:
        fwd_mode = "test" if test_mode else "val"

        def many(v, b, n):
            def body(i, acc):
                b2 = dict(b)
                b2["points"] = b["points"] + (i * jnp.float32(1e-12))
                r = model.apply(
                    v, b2, train=False, mode=fwd_mode,
                    rngs={"sample": jax.random.fold_in(jax.random.key(0), i)},
                )
                return acc + jnp.sum(r["rec_est"])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        step = jax.jit(many)
        args = (variables, jbatch)
    else:
        import optax
        from pcaccumulation_tpu.train.loss import fuse_loss

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        loss_w = cfg["loss"]
        max_inst = cfg["capacity"]["max_instances"]

        def loss_fn(p, bs, b, i):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, b, train=True, mode="train",
                rngs={"sample": jax.random.fold_in(jax.random.key(7), i)},
                mutable=["batch_stats"],
            )
            stats = fuse_loss(out, b, loss_w, max_inst)
            return stats["loss"], mut["batch_stats"]

        def many(p, bs, os_, b, n):
            def body(i, carry):
                p, bs, os_ = carry
                b2 = dict(b)
                b2["points"] = b["points"] + (i * jnp.float32(1e-12))
                (l, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, bs, b2, i
                )
                upd, os2 = tx.update(g, os_, p)
                return (optax.apply_updates(p, upd), bs2, os2)
            out = jax.lax.fori_loop(0, n, body, (p, bs, os_))
            return jnp.sum(out[0]["unet"]["down0"]["conv1"]["kernel"])

        step = jax.jit(many)
        args = (params, batch_stats, opt_state, jbatch)

    t0 = time.perf_counter()
    float(step(*args, jnp.int32(3)))
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    per = time_chained(step, args)
    mode = "train step" if train else ("test fwd" if test_mode else "val fwd")
    t = cfg["voxel_generator"]["n_sweeps"]
    print(f"{preset} T={t} B={bsz} {mode} [{label}]: "
          f"{per * 1e3:.2f} ms/step ({bsz / per:.1f} seq/s)")


if __name__ == "__main__":
    main()
