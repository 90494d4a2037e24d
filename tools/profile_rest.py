"""Profile the 'unaccounted' ops of the val forward (round-3).

profile_components.py covers the named modules (~15.7 of 24.9 ms at bench
shapes); this times the glue between them with realistic inputs taken from
an actual prepped batch: BEV scatters, the 3-shear warp, the FG top_k
gather, per-point ungrids, the ego pair-loss block, and the output merges.

Run: python tools/profile_rest.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import bench_cfg, make_batch
from pcaccumulation_tpu.models.pillar_encoder import (
    gather_bev_at_pillars,
    pillar_label_max,
    pillar_means,
    scatter_pillars_to_bev,
)
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.bilinear import temporal_ungrid, ungrid, warp_bev
from pcaccumulation_tpu.ops.segment import take_rows_unique


def time_fn(fn, args, n1=5, n2=20):
    def many(n, *a):
        def body(i, acc):
            pert = a[0] + (i * jnp.float32(1e-12)).astype(a[0].dtype)
            out = fn(pert, *a[1:])
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return acc + s

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
    cfg = bench_cfg(1)
    batch = make_batch(cfg, 1)
    jbatch = jax.tree.map(jnp.asarray, batch)
    vg = cfg["voxel_generator"]
    t, (h, w) = vg["n_sweeps"], (vg["grid_size"][1], vg["grid_size"][0])
    m = cfg["capacity"]["max_pillars"]
    n = cfg["capacity"]["max_points"]
    s_cap = cfg["capacity"]["max_fg_points"]
    cdim = 32
    key = jax.random.key(0)

    points = jbatch["points"].astype(jnp.float32)
    pvalid = jbatch["point_valid"]
    p2v = jbatch["pillar_of_point"]
    pcoords = jbatch["pillar_coords"]
    pilvalid = jbatch["pillar_valid"]
    tid = jbatch["time_idx"]

    rows = {}

    def rec(name, fn, args):
        rows[name] = time_fn(fn, args)
        print(f"{name:34s} {rows[name]*1e3:8.3f} ms", flush=True)

    feats = jax.random.normal(key, (1, m, cdim), jnp.float32)
    bf16 = jnp.bfloat16

    rec("pillar_means", lambda p: pillar_means(p, pvalid, p2v, m), (points,))
    rec("pillar_label_max",
        lambda L: pillar_label_max(L, pvalid, p2v, m), (jbatch["fb_labels"],))
    rec("scatter_bev feats[M,32]",
        lambda f: scatter_pillars_to_bev(f, pcoords, pilvalid, t, (h, w)),
        (feats,))
    rec("scatter_bev occ+fb [M,2]",
        lambda f: scatter_pillars_to_bev(f, pcoords, pilvalid, t, (h, w)),
        (feats[..., :2],))
    canvas = jax.random.normal(key, (1, t, h, w, cdim), jnp.float32)
    rec("gather_bev_at_pillars",
        lambda cv: gather_bev_at_pillars(cv, pcoords, pilvalid), (canvas,))

    # fb per-point gather
    fbp = jax.random.randint(key, (1, m), 0, 2)
    rec("fb per-point take",
        lambda f: jnp.take_along_axis(f, jnp.clip(p2v, 0, m - 1), axis=1),
        (fbp,))

    # warp: T-1 frames x 3 shears (bf16 like prod)
    fm = jax.random.normal(key, (t - 1, h, w, cdim), jnp.float32).astype(bf16)
    pose = jnp.broadcast_to(jnp.eye(4), (t - 1, 4, 4)).astype(jnp.float32)
    ang = jnp.stack([se3.make_transform(
        se3.euler_z_matrix(jnp.float32(0.05 * i)),
        jnp.array([0.5 * i, 0.2, 0.0])) for i in range(1, t)])
    rec("warp_bev shear x(T-1)",
        lambda f: jax.vmap(lambda a, p: warp_bev(
            a, p, 0.25, 0.25, -36.0, -36.0, method="shear"))(f, ang),
        (fm,))

    # FG selection: top_k vs sort-free alternatives
    rec_mask = (jbatch["fb_labels"] == 1) & pvalid

    def sel_topk(mask_f):
        _, sel = jax.lax.top_k(mask_f, s_cap)
        return sel

    rec("top_k FG select [N=60k]",
        lambda mf: sel_topk(mf), (rec_mask.astype(jnp.float32),))

    def sel_cumsum(mask_f):
        mask = mask_f > 0.5
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1  # [B, N]
        # scatter point index i into slot pos[i] where mask
        slot = jnp.where(mask, pos, s_cap)

        def one(sl):
            out = jnp.full((s_cap,), 0, jnp.int32)
            return out.at[jnp.clip(sl, 0, s_cap)].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")

        return jax.vmap(one)(jnp.where(slot < s_cap, slot, s_cap))

    rec("cumsum-compact FG select",
        lambda mf: sel_cumsum(mf), (rec_mask.astype(jnp.float32),))

    _, sel = jax.lax.top_k(rec_mask.astype(jnp.float32), s_cap)
    rec("take_rows_unique x5 [S=16k]",
        lambda p: (take_rows_unique(p, sel), take_rows_unique(tid, sel),
                   take_rows_unique(jbatch["inst_labels"], sel),
                   take_rows_unique(jbatch["sd_labels"], sel),
                   take_rows_unique(rec_mask, sel)),
        (points,))

    # per-point ungrids at S
    r_points = take_rows_unique(points, sel)
    r_tid = take_rows_unique(tid, sel)
    fullfm = jax.random.normal(key, (1, t, h, w, cdim), jnp.float32).astype(bf16)
    rec("temporal_ungrid [S=16k]",
        lambda f: jax.vmap(lambda a, p, ti: temporal_ungrid(
            a, p[:, :2], ti, -36.0))(f, r_points, r_tid),
        (fullfm,))
    mosmap = jax.random.normal(key, (1, h, w, 64), jnp.float32)
    rec("ungrid mos [S=16k]",
        lambda f: jax.vmap(lambda a, p: ungrid(a, p[:, :2], -36.0))(
            f, r_points),
        (mosmap,))
    rec("ungrid mos [N=60k]",
        lambda f: jax.vmap(lambda a, p: ungrid(a, p[:, :2], -36.0))(
            f, points),
        (mosmap,))

    # ego pair loss block: [B,P,N,3] transforms + norms
    p_pairs = t - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, p_pairs, 4, 4))

    def ego_loss(pts):
        pc_est = se3.apply_transform(pts[:, None], poses)
        pc_gt = se3.apply_transform(pts[:, None], poses + 1e-4)
        diff = pc_est - pc_gt
        in_frame = (tid[:, None, :] == jnp.arange(1, t)[None, :, None]) & pvalid[:, None, :]
        inf = in_frame.astype(jnp.float32)
        cnt = jnp.sum(inf, -1) + 1e-7
        l1 = jnp.sum(jnp.sum(jnp.abs(diff), -1) * inf, -1) / cnt
        l2 = jnp.sum(jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12) * inf, -1) / cnt
        return l1.sum() + l2.sum()

    rec("ego pair L1/L2 [P,N]", ego_loss, (points,))

    # se3 compensation + output merges
    poses_t = jnp.broadcast_to(jnp.eye(4), (1, t, 4, 4))
    rec("ego_motion_compensation [N]",
        lambda p: se3.ego_motion_compensation(p, tid, poses_t), (points,))

    sub = jax.random.normal(key, (1, s_cap, 3), jnp.float32)
    scatter_idx = jnp.where(take_rows_unique(rec_mask, sel), sel, n)
    rec("rec_est scatter-back [S->N]",
        lambda s: jax.vmap(lambda base, i, ss: base.at[i].set(ss, mode="drop"))(
            points, scatter_idx, s),
        (sub,))

    acc = sum(rows.values())
    print(f"\nsum of glue parts {acc*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
