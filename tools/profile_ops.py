"""Micro-benchmarks of the scatter/gather/segment ops around the model.

Pinpoints the superlinear-in-batch cost found by profile_components.py
(the 'unaccounted' 178 ms at B=4). Run: python tools/profile_ops.py [B]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.profile_components import time_fn
from pcaccumulation_tpu.models.pillar_encoder import (
    gather_bev_at_pillars,
    pillar_label_max,
    pillar_means,
    scatter_pillars_to_bev,
)
from pcaccumulation_tpu.ops.bilinear import temporal_ungrid, ungrid, warp_bev
from pcaccumulation_tpu.ops.segment import masked_segment_max


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t, h, w = 4, 288, 288
    n, m, s = 60000, 25000, 16384
    c = 32
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    print(f"B={b} T={t} HxW={h}x{w} N={n} M={m} S={s}", flush=True)

    feats = jax.random.normal(ks[0], (b, m, c))
    coords = jnp.stack([
        jax.random.randint(ks[1], (b, m), 0, t),
        jax.random.randint(ks[2], (b, m), 0, h),
        jax.random.randint(ks[3], (b, m), 0, w),
    ], axis=-1)
    pvalid = jnp.ones((b, m), bool)
    points = jax.random.uniform(ks[4], (b, n, 3), minval=-30, maxval=30)
    tid = jax.random.randint(ks[5], (b, n), 0, t)
    p2v = jax.random.randint(ks[6], (b, n), 0, m)
    pt_valid = jnp.ones((b, n), bool)
    canvas = jax.random.normal(ks[7], (b, t, h, w, c))
    # non-trivial rotation+translation: identity poses let XLA constant-
    # fold the shear shifts and the warp measures as free
    th = 0.08
    rot = jnp.array([[jnp.cos(th), -jnp.sin(th), 0, 0.7],
                     [jnp.sin(th), jnp.cos(th), 0, -0.4],
                     [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
    pose = jnp.broadcast_to(rot, (b, t - 1, 4, 4))
    rec_mask = jax.random.uniform(ks[8], (b, n)) < 0.2

    def bench(name, fn, *args):
        dt = time_fn(fn, args)
        print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)

    bench("bev_scatter_feats[32ch]",
          lambda f: scatter_pillars_to_bev(f, coords, pvalid, t, (h, w)), feats)
    bench("bev_scatter_small[5ch]",
          lambda f: scatter_pillars_to_bev(f[..., :5], coords, pvalid, t, (h, w)),
          feats)
    bench("gather_bev[32ch]",
          lambda cv: gather_bev_at_pillars(cv, coords, pvalid), canvas)
    bench("warp_bev[T-1]",
          lambda cv: jax.vmap(jax.vmap(
              lambda fm, p: warp_bev(fm, p, 0.25, 0.25, -36.0, -36.0)
          ))(cv[:, 1:], pose), canvas)
    bench("temporal_ungrid[N=60k]",
          lambda pts: jax.vmap(
              lambda fm, p, ti: temporal_ungrid(fm, p[:, :2], ti, -36.0)
          )(canvas, pts, tid), points)
    bench("temporal_ungrid[S=16k]",
          lambda pts: jax.vmap(
              lambda fm, p, ti: temporal_ungrid(fm, p[:, :2], ti, -36.0)
          )(canvas, pts[:, :s], tid[:, :s]), points)
    bench("ungrid64[S=16k]",
          lambda pts: jax.vmap(
              lambda fm, p: ungrid(fm, p[:, :2], -36.0)
          )(jnp.concatenate([canvas[:, 0]] * 2, -1), pts[:, :s]), points)

    score = rec_mask.astype(jnp.float32)
    bench("topk_fg_gather[S=16k]",
          lambda sc: jax.lax.top_k(sc, s)[1], score)

    def compact_gather(sc):
        # stream compaction: stable O(N) alternative to top_k
        msk = sc > 0.5
        pos = jnp.cumsum(msk.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(msk & (pos < s), pos, s)
        out = jnp.full((b, s + 1), 0, jnp.int32)
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
        out = jax.vmap(lambda o, sl, ix: o.at[sl].set(
            ix, mode="drop", unique_indices=True))(out, slot, idx)
        return out[:, :s]

    bench("compact_fg_gather[S=16k]", compact_gather, score)

    seg_ids = (jnp.arange(b, dtype=jnp.int32)[:, None] * (m + 1) + p2v).reshape(-1)
    net = jax.random.normal(ks[9], (b * n, c))
    bench("segment_max[BN->BM,32ch]",
          lambda x: masked_segment_max(x, seg_ids, pt_valid.reshape(-1),
                                       b * (m + 1)), net)
    bench("pillar_means+label_max",
          lambda pts: (pillar_means(pts, pt_valid, p2v, m),
                       pillar_label_max(tid, pt_valid, p2v, m)), points)

    # ego pair loss block (pc_est/pc_gt + masked means)
    from pcaccumulation_tpu.ops import se3
    from pcaccumulation_tpu.ops.numeric import safe_norm
    pose_pairs = jnp.broadcast_to(jnp.eye(4), (b, t - 1, 4, 4))
    src_f = jnp.arange(1, t)

    def ego_loss(pts):
        pc_est = se3.apply_transform(pts[:, None], pose_pairs)
        pc_gt = se3.apply_transform(pts[:, None], pose_pairs)
        diff = pc_est - pc_gt
        in_frame = ((tid[:, None, :] == src_f[None, :, None])
                    & pt_valid[:, None, :]).astype(pts.dtype)
        count = jnp.sum(in_frame, axis=-1) + 1e-7
        l1 = jnp.sum(jnp.sum(jnp.abs(diff), -1) * in_frame, -1) / count
        l2 = jnp.sum(safe_norm(diff, axis=-1) * in_frame, -1) / count
        return jnp.mean(l1) + jnp.mean(l2)

    bench("ego_pair_loss", ego_loss, points)

    def final_scatter(pts):
        sel = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        sub = pts[:, :s] + 1.0
        return jax.vmap(lambda base, idx, sb: base.at[idx].set(
            sb, mode="drop"))(pts, sel, sub)

    bench("rec_est_scatter[S=16k]", final_scatter, points)


if __name__ == "__main__":
    main()
