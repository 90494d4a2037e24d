"""Component-level TPU cost breakdown of the bench forward.

Times each stage of the MotionNet val forward at the bench shapes
(tools for VERDICT round-2 task 1: find the top cost centers). Uses the
same chained-fori_loop + two-run-length differencing as bench.py because
block_until_ready does not block through the axon tunnel. Each iteration
perturbs the first input by i*1e-12 so XLA cannot hoist the body out of
the loop.

Run: python tools/profile_components.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_cfg, make_batch
from pcaccumulation_tpu.models import MotionNet
from pcaccumulation_tpu.models.pillar_encoder import pillar_means


def time_fn(fn, args, n1=5, n2=20):
    """Seconds per call of fn(*args) on device."""

    def many(n, *a):
        def body(i, acc):
            pert = a[0] + (i * jnp.float32(1e-12))
            out = fn(pert, *a[1:])
            return acc + jnp.sum(
                jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)])
            )

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


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = bench_cfg(batch_size)
    batch = make_batch(cfg, batch_size)
    jbatch = jax.tree.map(jnp.asarray, batch)

    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )

    vg = cfg["voxel_generator"]
    b = batch_size
    t = vg["n_sweeps"]
    h = w = vg["grid_size"][0]
    n = cfg["capacity"]["max_points"]
    m = cfg["capacity"]["max_pillars"]
    k = cfg["capacity"]["max_instances"]
    cdim = 32
    print(f"shapes: B={b} T={t} HxW={h}x{w} N={n} M={m} K={k}", flush=True)

    key = jax.random.key(42)
    points = jbatch["points"].astype(jnp.float32)
    p_mean = pillar_means(points, jbatch["point_valid"], jbatch["pillar_of_point"], m)

    rows = {}

    def sub(name, method_fn, *args):
        fn = lambda *a: model.apply(  # noqa: E731
            variables, *a, method=method_fn,
            rngs={"sample": jax.random.key(7)},
        )
        rows[name] = time_fn(fn, args)
        print(f"{name:24s} {rows[name]*1e3:8.2f} ms", flush=True)

    # full forward
    full = lambda v, bt: model.apply(  # noqa: E731
        v, bt, train=False, mode="val", rngs={"sample": jax.random.key(7)}
    )["rec_est"]
    tfull = time_fn(lambda pts, v, bt: full(v, {**bt, "points": pts}),
                    (jbatch["points"], variables, jbatch))
    print(f"{'FULL val forward':24s} {tfull*1e3:8.2f} ms   "
          f"({batch_size / tfull:.1f} seq/s)", flush=True)

    # pillar encoder
    sub("pillar_encoder",
        lambda mdl, pts: mdl.pillar_encoder(
            pts, jbatch["time_idx"], jbatch["point_valid"],
            jbatch["pillar_of_point"], jbatch["pillar_coords"], p_mean, m),
        points)

    # unet backbone
    bev = jax.random.normal(key, (b * t, h, w, cdim), jnp.float32)
    sub("unet", lambda mdl, x: mdl.unet(x), bev)

    # seg heads (pre-fold [B*T, H, W, C] UNet output)
    bevf = jax.random.normal(key, (b, h, w, t * cdim), jnp.float32)
    sub("semseg_head", lambda mdl, x: mdl.semseg_head(x, train=False), bev)
    sub("ego_feats_head", lambda mdl, x: mdl.ego_feats_head(x, train=False), bev)

    # ego motion head
    feats = jax.random.normal(key, (b, m, cfg["pose_estimation"]["feats_dim"]))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    gt = jnp.broadcast_to(jnp.eye(4), (b, t, 4, 4))
    sub("egomotion_head",
        lambda mdl, f: mdl.ego_motion_head(
            f, p_mean, jbatch["pillar_coords"][..., 0], jbatch["pillar_valid"],
            jbatch["pillar_valid"], points, jbatch["time_idx"],
            jbatch["point_valid"], gt),
        feats)

    # stpn motion head (per-point decode on the FG subset, like MotionNet)
    s_fg = min(cfg["capacity"].get("max_fg_points", n) or n, n)
    warped = jax.random.normal(key, (b, h, w, t * cdim), jnp.float32)
    sub(f"stpn[S={s_fg}]",
        lambda mdl, wp: mdl.motionhead(
            wp, points[:, :s_fg], jbatch["point_valid"][:, :s_fg],
            cfg["voxel_generator"]["range"][0], train=False),
        warped)

    # folded shear warp (one row-shift kernel per pass over all frames)
    from pcaccumulation_tpu.ops.bilinear import warp_bev_folded
    vsz = vg["voxel_size"]
    rngp = np.random.default_rng(0)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (b, t, 4, 4)).copy()
    for bi in range(b):
        for ti in range(1, t):
            th = rngp.normal() * 0.02
            poses[bi, ti, :2, :2] = [[np.cos(th), -np.sin(th)],
                                     [np.sin(th), np.cos(th)]]
            poses[bi, ti, :2, 3] = rngp.normal(size=2) * 1.5
    rows["warp_bev_folded"] = time_fn(
        lambda x, p: warp_bev_folded(
            x, p, vsz[0], vsz[1], vg["range"][0], vg["range"][1]),
        (bevf, jnp.asarray(poses)))
    print(f"{'warp_bev_folded':24s} {rows['warp_bev_folded']*1e3:8.2f} ms",
          flush=True)

    # alignnet (tpointnet x n_iterations) at the real gathered size
    s_cap = min(cfg["capacity"].get("max_fg_points", n) or n, n)
    bb_f = jax.random.normal(key, (b, s_cap, cdim))
    mos_f = jax.random.normal(key, (b, s_cap, 64))
    inst_gt = jnp.broadcast_to(jnp.eye(4), (b, k, t, 4, 4))
    sub(f"alignnet[S={s_cap}]",
        lambda mdl, pts: mdl.reconstructor(
            pts[:, :s_cap], jbatch["time_idx"][:, :s_cap],
            jbatch["inst_labels"][:, :s_cap],
            jbatch["point_valid"][:, :s_cap], jbatch["sd_labels"][:, :s_cap],
            bb_f, mos_f, inst_gt, gt, gt, train=False),
        points)

    acc = sum(rows.values())
    print(f"\nsum of parts {acc*1e3:.2f} ms vs full {tfull*1e3:.2f} ms "
          f"(rest = scatters/gathers/warp/losses)", flush=True)


if __name__ == "__main__":
    main()
