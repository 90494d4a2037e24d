import numpy as np
import jax.numpy as jnp
from sklearn.cluster import DBSCAN

from pcaccumulation_tpu.ops.cluster import (
    cluster_moving_points,
    dbscan_labels,
    filter_and_canonicalise,
    voxel_downsample,
)


def make_blobs(rng, centers, n_per=60, scale=0.08):
    pts = np.concatenate(
        [rng.normal(scale=scale, size=(n_per, 3)) + c for c in centers]
    )
    return pts.astype(np.float32)


def test_dbscan_matches_sklearn_clusters(rng):
    centers = [[0, 0, 0], [3, 0, 0], [0, 4, 0], [6, 6, 0]]
    pts = make_blobs(rng, centers)
    n = pts.shape[0]
    pad = 64
    pts_pad = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

    ours = np.asarray(
        dbscan_labels(jnp.asarray(pts_pad), jnp.asarray(valid), 0.4, 5, n_iters=16)
    )[:n]
    ref = DBSCAN(eps=0.4, min_samples=5).fit_predict(pts)

    # identical partition: same co-membership matrix (label values differ)
    ours_noise = ours < 0
    ref_noise = ref < 0
    np.testing.assert_array_equal(ours_noise, ref_noise)
    m = ~ours_noise
    co_ours = ours[m][:, None] == ours[m][None, :]
    co_ref = ref[m][:, None] == ref[m][None, :]
    np.testing.assert_array_equal(co_ours, co_ref)


def test_small_clusters_filtered(rng):
    big = rng.normal(scale=0.05, size=(40, 3)) + [0, 0, 0]
    small = rng.normal(scale=0.05, size=(8, 3)) + [5, 5, 0]
    pts = np.concatenate([big, small]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    labels = dbscan_labels(jnp.asarray(pts), jnp.asarray(valid), 0.4, 5)
    out = np.asarray(filter_and_canonicalise(labels, jnp.asarray(valid), 15))
    assert set(out[:40]) == {1}
    assert set(out[40:]) == {0}  # below min_p_cluster -> background


def test_voxel_downsample_unique(rng):
    pts = (rng.random((500, 3)) * 2).astype(np.float32)
    valid = rng.random(500) > 0.1
    rep_idx, rep_valid, inverse = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(valid), 0.25, 512
    )
    rep_idx, rep_valid, inverse = map(np.asarray, (rep_idx, rep_valid, inverse))
    n_unique = rep_valid.sum()
    # brute-force unique count
    q = np.round(pts[valid] / 0.25).astype(int)
    expected = len(np.unique(q, axis=0))
    assert n_unique == expected
    # every valid point maps to a representative in the same voxel
    for i in np.where(valid)[0][:100]:
        r = rep_idx[inverse[i]]
        assert np.array_equal(
            np.round(pts[i] / 0.25).astype(int), np.round(pts[r] / 0.25).astype(int)
        )


def test_capacity_overflow_sheds_smallest_clusters(rng):
    """More clusters than max_instances: with order='size' the ids are
    1..C by descending point count, so the caller's `label < k_cap` drop
    (models/motionnet.py test mode) sheds exactly the smallest clusters."""
    sizes = [120, 90, 70, 50, 40, 30, 25, 20]  # 8 clusters, k_cap = 5
    centers = [[6 * i, 6 * (i % 3), 0.0] for i in range(len(sizes))]
    chunks = [
        rng.normal(scale=0.1, size=(s, 3)) + c for s, c in zip(sizes, centers)
    ]
    pts = np.concatenate(chunks).astype(np.float32)
    n = len(pts)
    valid = np.ones(n, bool)
    labels = np.asarray(
        cluster_moving_points(
            jnp.asarray(pts), jnp.zeros((n, 2), jnp.float32),
            jnp.asarray(valid), jnp.asarray(valid),
            max_cluster_points=1024, pre_voxel=0.01,
        )
    )
    bounds = np.cumsum([0] + sizes)
    per_cluster = [labels[bounds[i]:bounds[i + 1]] for i in range(len(sizes))]
    ids = [np.unique(c[c > 0]) for c in per_cluster]
    assert all(len(i) == 1 for i in ids), ids
    ids = np.array([i[0] for i in ids])
    # descending size => ascending canonical id
    assert list(ids) == sorted(ids), ids
    # the k_cap drop keeps the k_cap-1 largest clusters
    k_cap = 5
    kept = ids[ids < k_cap]
    assert len(kept) == k_cap - 1
    assert set(kept) == set(ids[: k_cap - 1]), (kept, ids)

    # 'first' ordering (reference parity) still numbers by appearance
    from pcaccumulation_tpu.ops.cluster import dbscan_labels

    raw = dbscan_labels(jnp.asarray(pts), jnp.asarray(valid), 0.4, 5)
    first = np.asarray(filter_and_canonicalise(raw, jnp.asarray(valid), 15, "first"))
    firsts = [np.unique(first[bounds[i]:bounds[i + 1]]) for i in range(len(sizes))]
    assert [f[0] for f in firsts] == list(range(1, len(sizes) + 1))


def test_cluster_moving_points_end_to_end(rng):
    # two moving objects whose offsets vote toward their centres
    c1, c2 = np.array([2.0, 1.0, 0.5]), np.array([-3.0, 2.0, 0.5])
    o1 = rng.normal(scale=0.3, size=(80, 3)) + c1
    o2 = rng.normal(scale=0.3, size=(90, 3)) + c2
    bg = rng.normal(scale=5.0, size=(200, 3))
    pts = np.concatenate([o1, o2, bg]).astype(np.float32)
    n = len(pts)
    moving = np.zeros(n, bool)
    moving[:170] = True
    valid = np.ones(n, bool)
    offset = np.zeros((n, 2), np.float32)
    offset[:80] = (c1[:2] - o1[:, :2])
    offset[80:170] = (c2[:2] - o2[:, :2])

    labels = np.asarray(
        cluster_moving_points(
            jnp.asarray(pts), jnp.asarray(offset), jnp.asarray(moving),
            jnp.asarray(valid), max_cluster_points=512,
        )
    )
    assert set(labels[170:]) == {0}
    l1 = set(labels[:80]) - {0}
    l2 = set(labels[80:170]) - {0}
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2
    # offset-voting collapses each object to a tight ball -> nearly all in
    assert (labels[:80] != 0).mean() > 0.95
    assert (labels[80:170] != 0).mean() > 0.95
