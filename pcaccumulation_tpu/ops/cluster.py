"""Static-shape density clustering — the TPU-native DBSCAN substitute.

Replaces the reference's host-side sklearn DBSCAN + torchsparse voxel
downsample (models/cluster.py:9-111, eps=0.4, min_samples=5, pre-voxel
0.05 m, z flattened, clusters < min_p_cluster dropped, labels
canonicalised by first appearance). Everything here is fixed-capacity and
jit-compiles:

  * voxel downsample = sort + first-occurrence flags + prefix sum;
  * DBSCAN connectivity = core-point label propagation over the ≤eps
    adjacency with pointer-jumping (path halving), which converges in
    O(log N) rounds instead of the worst-case graph diameter;
  * border points adopt the smallest core-neighbour label, noise stays 0.

sklearn semantics preserved: min_samples counts the point itself; border
points join a cluster of *some* core neighbour (we pick the canonical
minimum — sklearn picks discovery order, so individual border points can
differ on ties; cluster membership of core points is identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def voxel_downsample(points, valid, voxel_size: float, max_out: int):
    """First-occurrence voxel dedup with static output capacity.

    Returns (rep_idx [max_out] int32 indices into points,
             rep_valid [max_out] bool,
             inverse [N] int32 in [0, max_out) mapping each point to its
             representative slot; invalid points map to 0).
    """
    n = points.shape[0]
    q = jnp.round(points / voxel_size).astype(jnp.int32)
    # lexicographic sort on (valid-first, x, y, z) — avoids int64 keys,
    # which are unavailable without jax_enable_x64
    invalid = (~valid).astype(jnp.int32)
    order = jnp.lexsort((q[:, 2], q[:, 1], q[:, 0], invalid))
    qs = q[order]
    vs = valid[order]  # valid entries are contiguous at the front
    differs = jnp.any(qs[1:] != qs[:-1], axis=1)
    first = jnp.concatenate([jnp.ones((1,), bool), differs]) & vs
    voxel_id_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N]
    n_unique = jnp.sum(first)

    inverse = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.clip(voxel_id_sorted, 0, max_out - 1)
    )
    # scatter the first point of each voxel into its slot; voxels beyond
    # capacity collapse onto the last slot (rare overflow, mirrors the
    # reference's max_voxels drop)
    rep_idx = jnp.zeros(max_out, jnp.int32).at[
        jnp.where(first, jnp.clip(voxel_id_sorted, 0, max_out - 1), max_out - 1)
    ].set(order.astype(jnp.int32))
    rep_valid = jnp.arange(max_out) < jnp.minimum(n_unique, max_out)
    return rep_idx, rep_valid, inverse


def _neighbour_pass(points, valid, labels_masked, eps2, block: int,
                    n_used=None):
    """One tiled sweep over the implicit <=eps adjacency.

    Returns (neighbour_count [N] int32, neighbour_label_min [N] int32)
    without ever materialising the [N, N] matrix: rows are processed in
    blocks of `block`, so peak memory is O(block * N) instead of O(N^2)
    (round 1 materialised a ~1 GB d2 at the default 16384-point cap).
    Distances use the exact difference form, keeping co-membership
    bit-identical to the previous dense implementation (and sklearn).

    n_used (traced scalar, optional): 1 + the highest valid index. Row
    blocks entirely past it are SKIPPED — such rows are invalid, so a
    full sweep would produce exactly the skipped blocks' initial
    (0, _BIG) anyway. The clusterer runs at a fixed capacity (8192 reps)
    but trained models mark only a few hundred–few thousand points
    moving, and these O(N^2) sweeps are the test-step's hottest item —
    the dynamic trip count makes them scale with the actual count while
    staying exact for any count. Rows-only is deliberate: also tiling
    the COLUMNS dynamically won isolated but regressed the composed
    saturated test step by +1.6 ms (nested-fori carries defeat XLA's
    overlap) — measured and rejected, tools/PROFILE_r12.md.
    """
    n = points.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    val = jnp.pad(valid, (0, pad))
    nb_used = nb if n_used is None else (n_used + block - 1) // block

    def row_block(i, out):
        cnts, nmins = out
        r0 = i * block
        rows = jax.lax.dynamic_slice(pts, (r0, 0), (block, 3))
        rvalid = jax.lax.dynamic_slice(val, (r0,), (block,))
        d2 = jnp.sum((rows[:, None] - points[None]) ** 2, axis=-1)
        adj = (d2 <= eps2) & rvalid[:, None] & valid[None, :]
        cnt = jnp.sum(adj, axis=1).astype(jnp.int32)
        nmin = jnp.min(jnp.where(adj, labels_masked[None, :], _BIG), axis=1)
        cnts = jax.lax.dynamic_update_slice(cnts, cnt, (r0,))
        nmins = jax.lax.dynamic_update_slice(nmins, nmin, (r0,))
        return cnts, nmins

    cnts, nmins = jax.lax.fori_loop(
        0, nb_used, row_block,
        (jnp.zeros(nb * block, jnp.int32),
         jnp.full(nb * block, _BIG, jnp.int32)),
    )
    return cnts[:n], nmins[:n]


def dbscan_labels(
    points,
    valid,
    eps: float,
    min_samples: int,
    n_iters: int = 16,
    block: int = 512,
):
    """DBSCAN cluster ids over [N, 3] points; 0-based representative index
    labels, -1 for noise. N is static; memory is O(block * N) via the
    tiled neighbour pass (no [N, N] adjacency)."""
    n = points.shape[0]
    eps2 = eps * eps
    # rows/columns past the last valid index never contribute; every
    # sweep below skips their tiles (exact — see _neighbour_pass)
    n_used = jnp.max(jnp.where(valid, jnp.arange(n, dtype=jnp.int32) + 1, 0))
    counts, _ = _neighbour_pass(
        points, valid, jnp.zeros(n, jnp.int32), eps2, block, n_used
    )
    core = (counts >= min_samples) & valid

    idx = jnp.arange(n, dtype=jnp.int32)
    labels = jnp.where(core, idx, _BIG)

    def jump(labels):
        # pointer jumping: follow the representative's representative
        jumped = labels[jnp.clip(labels, 0, n - 1)]
        return jnp.where(core & (labels < _BIG), jnp.minimum(labels, jumped), labels)

    def body(state):
        i, labels, _ = state
        # min label over core neighbours (core-core propagation):
        # masking non-core labels to _BIG is equivalent to restricting the
        # adjacency columns to core points
        lab_core = jnp.where(core, labels, _BIG)
        _, neigh_min = _neighbour_pass(points, valid, lab_core, eps2, block,
                                       n_used)
        new = jnp.where(core, jnp.minimum(labels, neigh_min), labels)
        # several cheap pointer jumps per expensive neighbour pass
        for _ in range(3):
            new = jump(new)
        return i + 1, new, jnp.any(new != labels)

    def cond(state):
        i, _, changed = state
        return changed & (i < n_iters)

    # converged fixpoint: identical result to always running n_iters
    # passes, but typical scenes stop after a handful (each neighbour
    # pass is the O(N^2 / block) hot part — test-mode profile)
    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(True))
    )

    # border points: smallest core-neighbour label
    lab_core = jnp.where(core, labels, _BIG)
    _, border_min = _neighbour_pass(points, valid, lab_core, eps2, block,
                                    n_used)
    labels = jnp.where(core, labels, border_min)
    return jnp.where(valid & (labels < _BIG), labels, -1)


def filter_and_canonicalise(labels, valid, min_cluster_size: int,
                            order: str = "first"):
    """Drop clusters smaller than min_cluster_size, then renumber clusters
    1..C; noise/background -> 0 (models/cluster.py:36-49 +
    toolbox/utils.py:237).

    order:
      'first' — by first appearance, the reference's
        canonicalise_random_indice semantics.
      'size'  — by DESCENDING point count (first appearance breaks ties).
        The reference is unbounded (alignnet.py:198-206); our test-time
        instance capacity drops ids >= max_instances
        (models/motionnet.py), so size ordering makes that overflow shed
        the SMALLEST clusters instead of arbitrary ones.
    """
    n = labels.shape[0]
    lab = jnp.where(labels < 0, n, labels)  # noise -> overflow bucket
    sizes = jax.ops.segment_sum(
        valid.astype(jnp.int32), lab, num_segments=n + 1
    )
    keep = sizes[jnp.clip(lab, 0, n)] >= min_cluster_size
    lab = jnp.where((lab < n) & keep, lab, n)

    # rank of each surviving representative label
    idx = jnp.arange(n, dtype=jnp.int32)
    first_occ = jax.ops.segment_min(idx, lab, num_segments=n + 1)[:n]
    used = jax.ops.segment_sum(jnp.ones_like(idx), lab, num_segments=n + 1)[:n] > 0
    occ_key = jnp.where(used, first_occ, _BIG)
    if order == "size":
        size_key = jnp.where(used, -sizes[:n], _BIG)
        sort_order = jnp.lexsort((occ_key, size_key))
    else:
        sort_order = jnp.argsort(occ_key)
    rank = jnp.zeros(n, jnp.int32).at[sort_order].set(idx)
    new_id = rank + 1  # 1-based cluster ids
    return jnp.where(lab < n, new_id[jnp.clip(lab, 0, n - 1)], 0)


def cluster_moving_points(
    transformed_points,  # [N, 3] anchor-frame points
    offset,              # [N, 2] predicted instance-centre offsets
    moving,              # [N] bool — points to cluster (mos == 1)
    valid,               # [N] bool
    eps: float = 0.4,
    min_samples: int = 5,
    min_cluster_size: int = 15,
    pre_voxel: float = 0.05,
    max_cluster_points: int = 8192,
    n_iters: int = 16,
    label_order: str = "size",
):
    """Full test-time clustering path (models/cluster.py:52-84): shift by
    offset, voxel-downsample, flatten z, DBSCAN, size filter, canonicalise,
    broadcast back. Returns [N] int32 instance labels (0 = background).

    label_order defaults to 'size' (descending) so the caller's
    max_instances capacity drop sheds the smallest clusters; pass 'first'
    for the reference's first-appearance numbering."""
    pts = transformed_points.at[:, :2].add(offset)
    sel = moving & valid

    rep_idx, rep_valid, inverse = voxel_downsample(pts, sel, pre_voxel, max_cluster_points)
    rep_pts = pts[rep_idx].at[:, 2].set(0.0)  # z flattened after downsample

    labels_rep = dbscan_labels(rep_pts, rep_valid, eps, min_samples, n_iters)
    labels_rep = filter_and_canonicalise(
        labels_rep, rep_valid, min_cluster_size, order=label_order
    )

    per_point = labels_rep[inverse]
    return jnp.where(sel, per_point, 0).astype(jnp.int32)
