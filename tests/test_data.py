import os

import numpy as np
import jax.numpy as jnp
import pytest

from pcaccumulation_tpu.config import load_config
from pcaccumulation_tpu.data.synthetic import generate_sample, write_synthetic_dataset
from pcaccumulation_tpu.data.voxelizer import voxelize
from pcaccumulation_tpu.data.dataset import prep_sample, SceneDataset
from pcaccumulation_tpu.data.loader import make_loader
from pcaccumulation_tpu.ops import se3


def small_cfg(tmp_path=None):
    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-36, -36, -5, 36, 36, 3], "voxel_size": [0.25, 0.25, 8], "n_sweeps": 5,
         "crop_range": [32, -5, 3]}
    )
    cfg["capacity"] = {"max_points": 20000, "max_pillars": 12000, "max_instances": 8}
    cfg["data"]["n_frames"] = 5
    if tmp_path is not None:
        cfg["path"]["dataset_base"] = str(tmp_path)
    return cfg


def test_synthetic_gt_consistency():
    """Ego compensation + instance motion must collapse each dynamic object
    onto its frame-0 footprint (the core contract at libs/dataset.py:38-41)."""
    data = generate_sample(seed=0, n_frames=5)
    pts = jnp.asarray(data["raw_points"])
    tid = jnp.asarray(data["time_indice"])
    inst = jnp.asarray(data["inst_labels"])
    ego = jnp.asarray(data["ego_motion_gt"])
    bbox = jnp.asarray(data["bbox_tsfm"])

    comp = se3.ego_motion_compensation(pts, tid, ego)
    rec = se3.reconstruct_sequence(comp, tid, inst, bbox)

    rec = np.asarray(rec)
    tid_np, inst_np = np.asarray(tid), np.asarray(inst)

    # background points: reconstruction == ego compensation (identity motion),
    # and static world structure stays static across frames
    for k in range(1, int(inst_np.max()) + 1):
        sel0 = (inst_np == k) & (tid_np == 0)
        centre0 = rec[sel0].mean(0)
        for t in range(1, 5):
            selt = (inst_np == k) & (tid_np == t)
            centre_t = rec[selt].mean(0)
            assert np.linalg.norm(centre_t - centre0) < 0.05, (k, t)


def test_synthetic_motion_labels():
    data = generate_sample(seed=1, n_frames=5)
    # moving points are foreground; background is static
    assert np.all(data["fb_labels"][data["sd_labels"] == 1] == 1)
    assert np.all(data["inst_labels"][data["fb_labels"] == 0] == 0)


def test_voxelize_bruteforce(rng):
    n = 5000
    pts = (rng.random((n, 3)) * 70 - 35).astype(np.float32)
    tid = rng.integers(0, 5, n).astype(np.int32)
    coords, valid, p2v, in_range = voxelize(
        pts, tid, [0.25, 0.25, 8], [-36, -36, -5, 36, 36, 3], 5, 12000
    )
    m = valid.sum()
    # every valid point maps to a pillar whose (t, y, x) matches its own cell
    for i in rng.choice(n, 200, replace=False):
        if not in_range[i] or p2v[i] >= 12000:
            continue
        t, y, x = coords[p2v[i]]
        assert t == tid[i]
        assert x == int(np.floor((pts[i, 0] + 36) / 0.25))
        assert y == int(np.floor((pts[i, 1] + 36) / 0.25))
    # pillars are unique
    keys = coords[valid]
    assert len(np.unique(keys[:, 0] * 10**8 + keys[:, 1] * 10**4 + keys[:, 2])) == m


def test_native_voxelizer_matches_numpy(rng):
    """C++ hash voxelizer and numpy unique voxelizer must agree on the
    partition (pillar ids are internal, so compare point->cell mapping)."""
    import importlib
    import pcaccumulation_tpu.data.voxelizer as vx
    from pcaccumulation_tpu.native.host import native_voxelize

    n = 8000
    pts = (rng.random((n, 3)) * 70 - 35).astype(np.float32)
    tid = rng.integers(0, 5, n).astype(np.int32)
    args = ([0.25, 0.25, 8], [-36, -36, -5, 36, 36, 3], 5, 12000)

    nat = native_voxelize(pts, tid, *args)
    assert nat is not None, "native lib failed to build"
    coords_n, valid_n, p2v_n, inr_n = nat

    old = vx._USE_NATIVE
    vx._USE_NATIVE = False
    try:
        coords_p, valid_p, p2v_p, inr_p = vx.voxelize(pts, tid, *args)
    finally:
        vx._USE_NATIVE = old

    assert valid_n.sum() == valid_p.sum()
    np.testing.assert_array_equal(inr_n, inr_p)
    # same cell for every point (ids differ, cells must match)
    sel = inr_n & (p2v_n < 12000)
    np.testing.assert_array_equal(coords_n[p2v_n[sel]], coords_p[p2v_p[sel]])


def test_prep_sample_shapes_and_masks():
    cfg = small_cfg()
    data = generate_sample(seed=2, n_frames=5)
    s = prep_sample(data, cfg, augment=False)
    cap = cfg["capacity"]
    assert s["points"].shape == (cap["max_points"], 3)
    assert s["pillar_coords"].shape == (cap["max_pillars"], 3)
    assert s["inst_motion_gt"].shape == (cap["max_instances"], 5, 4, 4)
    assert s["point_valid"].sum() > 1000
    # all valid points lie inside the crop
    v = s["point_valid"]
    assert np.abs(s["points"][v][:, :2]).max() < 32.0
    # ground removed
    assert s["points"][v][:, 2].min() > cfg["data"]["ground_height"] + cfg["data"]["ground_slack"]
    # anchor frame pose is identity
    np.testing.assert_allclose(s["ego_motion_gt"][0], np.eye(4), atol=1e-6)


def test_label_free_zero_labels_cannot_cross_corrupt():
    """with_labels=False builds the four label channels from one aliased
    zeros array (round-4 advisor finding): an in-place write to one
    channel must either fail loudly (read-only alias) or be invisible to
    the other channels (independent post-pad copies) — never silently
    corrupt a sibling channel."""
    cfg = small_cfg()
    s = prep_sample(generate_sample(seed=3, n_frames=5), cfg,
                    augment=False, with_labels=False)
    sd = s["sd_labels"]
    if sd.flags.writeable:
        sd[0] = 7
        for k in ("fb_labels", "inst_labels", "sem_labels"):
            assert s[k][0] == 0, f"{k} corrupted through sd_labels alias"
    else:
        with pytest.raises(ValueError):
            sd[0] = 7


def test_native_lib_loads_without_source(monkeypatch):
    """An install shipping only the .so (no pcacc_host.cpp) must load it
    instead of raising FileNotFoundError from the staleness check or
    attempting a rebuild (round-4 advisor finding)."""
    import pcaccumulation_tpu.native.host as host

    if host.get_lib() is None:
        pytest.skip("native library unavailable")
    real_exists = os.path.exists
    monkeypatch.setattr(host, "_lib", None)  # force a fresh load
    monkeypatch.setattr(
        host.os.path, "exists",
        lambda p: False if str(p).endswith(".cpp") else real_exists(p),
    )

    def _no_rebuild(*a, **k):
        raise AssertionError("source missing must not trigger a rebuild")

    monkeypatch.setattr(host.subprocess, "run", _no_rebuild)
    assert host.get_lib() is not None


def test_native_sort_by_key_matches_stable_argsort():
    """The native counting sort must equal a stable np.argsort with
    overflow keys clamped into the shared last bucket (skip when the
    native library is unavailable — prep falls back to np.argsort)."""
    from pcaccumulation_tpu.native.host import native_sort_by_key

    rng = np.random.default_rng(1)
    keys = rng.integers(0, 40007, 120000).astype(np.int32)
    order = native_sort_by_key(keys, 40000)
    if order is None:
        import pytest

        pytest.skip("native library unavailable")
    ref = np.argsort(np.clip(keys, 0, 40000), kind="stable")
    np.testing.assert_array_equal(order, ref)


def test_prep_sample_label_free_path_matches():
    """with_labels=False (the serving prep) must produce an identical
    sample apart from zeroed label channels — same point order, same
    pillar assignment, same GT poses."""
    cfg = small_cfg()
    data = generate_sample(seed=2, n_frames=5)
    a = prep_sample(dict(data), cfg, augment=False)
    b = prep_sample(dict(data), cfg, augment=False, with_labels=False)
    assert set(a) == set(b)
    label_keys = ("sd_labels", "fb_labels", "inst_labels", "sem_labels")
    for k in a:
        if k in label_keys:
            assert (b[k] == 0).all(), k
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert a["inst_labels"].max() > 0  # labelled path is nontrivial


def test_augmentation_preserves_gt_consistency():
    """Pose conjugation must keep reconstruction consistent after augmentation
    (dataset.py:118-138)."""
    cfg = small_cfg()
    checked_total = 0
    for seed in (3, 4, 5, 6):
        checked_total += _check_one_aug(cfg, seed)
    assert checked_total >= 1, "no fully-visible instance across seeds"


def _check_one_aug(cfg, seed):
    # keep the scene under max_points so the capacity subsample does not
    # thin the per-object counts below the full-visibility check
    data = generate_sample(seed=seed, n_frames=5, area=18.0,
                           n_static_clusters=10, pts_per_cluster=150)
    s = prep_sample(data, cfg, augment=True, rng=np.random.default_rng(0))
    v = s["point_valid"]
    pts = jnp.asarray(s["points"][v])
    tid = jnp.asarray(s["time_idx"][v])
    inst = jnp.asarray(s["inst_labels"][v])
    comp = se3.ego_motion_compensation(pts, tid, jnp.asarray(s["ego_motion_gt"]))
    rec = np.asarray(
        se3.reconstruct_sequence(comp, tid, inst, jnp.asarray(s["inst_motion_gt"]))
    )
    tid_np, inst_np = np.asarray(tid), np.asarray(inst)
    checked = 0
    for k in range(1, int(inst_np.max()) + 1):
        counts = [(inst_np == k) & (tid_np == t) for t in range(5)]
        # objects straddling the crop boundary lose different points per
        # frame, which shifts centroids — only fully-visible objects are a
        # valid consistency probe (each object has 80 points per frame)
        if any(c.sum() < 78 for c in counts):
            continue
        centre0 = rec[counts[0]].mean(0)
        for t in range(1, 5):
            assert np.linalg.norm(rec[counts[t]].mean(0) - centre0) < 0.08
        checked += 1
    return checked


def test_dataset_and_loader(tmp_path):
    cfg = small_cfg(tmp_path)
    write_synthetic_dataset(str(tmp_path), n_samples=6, n_frames=5)
    ds = SceneDataset(cfg, "train")
    assert len(ds) == 3
    loader = make_loader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["points"].shape == (2, cfg["capacity"]["max_points"], 3)
    assert b["pillar_valid"].shape == (2, cfg["capacity"]["max_pillars"])


def test_loader_worker_failure_propagates(tmp_path):
    """A prefetch-worker exception must surface in the consumer instead of
    deadlocking q.get() (round-1 weakness)."""

    class BadDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            return {"x": np.zeros(2)}

    loader = make_loader(BadDataset(), batch_size=2, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


class _IdxDataset:
    """Top-level so fork-children resolve it; returns index-tagged dicts."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full(3, i, np.int64), "y": np.arange(4) * i}


class _BadProcDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 3:
            raise ValueError("boom")
        return {"x": np.zeros(2)}


class _DyingProcDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 3:
            os._exit(13)  # simulate a segfault/OOM kill: no exception raised
        return {"x": np.zeros(2)}


def test_process_loader_matches_sync():
    """mode="process" (the reference's worker-process model,
    libs/dataloader.py:57) yields batch-for-batch IDENTICAL output to the
    synchronous loader — and in the original order (the round-robin
    consumer is deterministic, unlike thread mode's arbitrary
    interleave)."""
    ds = _IdxDataset(10)
    ref = list(make_loader(ds, batch_size=2, num_workers=0, seed=3))
    for workers in (1, 2, 3):
        got = list(make_loader(ds, batch_size=2, num_workers=workers,
                               mode="process", seed=3))
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_process_loader_worker_failure_propagates():
    """A worker-process exception must surface in the consumer (with the
    worker's traceback) instead of deadlocking the queue get."""
    loader = make_loader(_BadProcDataset(), batch_size=2, num_workers=2,
                         mode="process", seed=0)
    with pytest.raises(RuntimeError, match="worker failed.*boom"):
        list(loader)


def test_process_loader_worker_death_detected():
    """A worker that DIES without raising (segfault/OOM-kill analogue)
    must be detected by liveness polling, not hang the consumer."""
    loader = make_loader(_DyingProcDataset(), batch_size=2, num_workers=2,
                         mode="process", seed=0)
    with pytest.raises(RuntimeError, match="died"):
        list(loader)


def test_loader_process_sharding():
    """Multi-host input sharding: same-seed processes draw disjoint,
    equally-sized batch slices covering (almost) the full epoch."""

    class Dummy:
        def __len__(self):
            return 21

        def __getitem__(self, i):
            return {"x": np.array([i])}

    loaders = [
        make_loader(Dummy(), batch_size=2, num_workers=0, seed=7,
                    process_id=p, process_count=3)
        for p in range(3)
    ]
    assert all(len(ld) == len(loaders[0]) for ld in loaders)
    seen = []
    for ld in loaders:
        for batch in ld:
            seen.extend(batch["x"][:, 0].tolist())
    assert len(seen) == len(set(seen))  # disjoint
    assert len(seen) == 3 * len(loaders[0]) * 2


# ------------------------------------------------------- ground fitting ---

def test_ground_plane_fit_recovers_tilted_plane():
    from pcaccumulation_tpu.data.ground import fit_ground_plane, non_ground_mask
    rng = np.random.default_rng(0)
    # tilted ground: z = 0.05x - 0.02y - 1.5, plus objects above it
    xy = rng.uniform(-40, 40, size=(4000, 2))
    gz = 0.05 * xy[:, 0] - 0.02 * xy[:, 1] - 1.5
    ground = np.concatenate([xy, (gz + rng.normal(0, 0.03, 4000))[:, None]], 1)
    obj_xy = rng.uniform(-30, 30, size=(600, 2))
    obj_z = (0.05 * obj_xy[:, 0] - 0.02 * obj_xy[:, 1] - 1.5
             + rng.uniform(0.8, 2.5, 600))
    objects = np.concatenate([obj_xy, obj_z[:, None]], 1)
    pts = np.concatenate([ground, objects])

    normal, d, is_ground = fit_ground_plane(pts)
    true_n = np.array([-0.05, 0.02, 1.0])
    true_n /= np.linalg.norm(true_n)
    assert abs(normal @ true_n) > 0.999          # < ~2.5 deg off
    assert is_ground[:4000].mean() > 0.98        # ground kept
    assert is_ground[4000:].mean() < 0.02        # objects kept out
    mask = non_ground_mask(pts)
    np.testing.assert_array_equal(mask, ~is_ground)


def test_ground_plane_fit_beats_height_threshold_on_slope():
    # on an 8%-grade slope a flat z-cut misclassifies; the plane fit doesn't
    from pcaccumulation_tpu.data.ground import non_ground_mask
    rng = np.random.default_rng(1)
    x = rng.uniform(-50, 50, size=6000)
    y = rng.uniform(-50, 50, size=6000)
    z = 0.08 * x - 1.6 + rng.normal(0, 0.02, 6000)
    pts = np.stack([x, y, z], 1)
    keep = non_ground_mask(pts)
    assert keep.mean() < 0.02                    # plane fit: all ground
    flat_cut_keep = z > -1.3                     # height threshold keeps 40%+
    assert flat_cut_keep.mean() > 0.3


def test_ground_plane_fit_edge_cases():
    from pcaccumulation_tpu.data.ground import fit_ground_plane
    n, d, g = fit_ground_plane(np.zeros((0, 3)))
    assert g.shape == (0,)
    # two points: degenerate seed set falls back to the height band
    pts = np.array([[0.0, 0, 5.0], [1.0, 0, 5.1]])
    n, d, g = fit_ground_plane(pts, seed_margin=-10.0)
    assert g.shape == (2,)
