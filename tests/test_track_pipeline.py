"""Tracker over REAL pipeline output (VERDICT r4 Missing #4).

Feeds a multi-sequence synthetic stream through `serve.Predictor` (the
full jitted test-mode pipeline: voxelize -> backbone -> on-device DBSCAN
clustering -> instance reconstruction), extracts per-frame instance
centroids from the predicted `inst_labels` with
`track.centroids_from_labels`, runs the AB3DMOT-style `ClusterTracker`
across the sequence boundaries, and asserts the synthetic dynamic
objects keep stable track ids for the whole stream.

Model weights: seed-0 init with the FB/MOS head output layers biased to
"everything foreground/moving" and the offset head zeroed. That keeps
the test deterministic while still exercising the REAL clustering +
reconstruction + serving path — instances come from the actual on-device
DBSCAN over the actual voxelized geometry (dense blobs cluster; the
sparse clutter is dropped by the <min_points rule exactly as in
production). Model *accuracy* is covered by the hardware convergence
runs (docs/CONV_r07.md, tools/PROFILE_r11.md); what this test pins is
the serving -> tracker integration the reference leaves implicit
(toolbox/tracker.py:137 is standalone there too).
"""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SEQ = 3  # sequences in the stream; tracker must bridge the boundaries
CENTERS = np.array([[-8.0, 3.0, 0.0], [5.0, -6.0, 0.0], [2.0, 9.0, 0.0]])
VELS = np.array([[0.5, 0.0, 0.0], [-0.4, 0.3, 0.0], [0.0, -0.5, 0.0]])


@pytest.fixture(scope="module")
def predictor():
    from pcaccumulation_tpu.config import derive, load_config
    from pcaccumulation_tpu.serve import Predictor

    cfg = load_config("configs/synthetic.yaml")
    # shrink the op-graph like tiny_cfg (CPU compile time)
    cfg["unet"]["depth"] = 3
    cfg["pillar_encoder"]["depth"] = 2
    cfg["pose_estimation"]["sinkhorn_iter"] = 2
    cfg["pose_estimation"]["n_kpts"] = 128
    cfg["cluster"]["bfs_iters"] = 8
    cfg["tpointnet"]["n_iterations"] = 1
    cfg = derive(cfg)

    base = Predictor(cfg)
    v = jax.tree.map(np.asarray, jax.device_get(base.variables))
    p = v["params"]
    # oracle heads (see module docstring): zero the final kernels, bias
    # class 1 up — all points foreground + moving, offsets exactly zero,
    # so instances are the geometric DBSCAN clusters
    for head, bias in (
        (p["semseg_head"]["conv1"], [-8.0, 8.0]),
        (p["motionhead"]["mos_seg"]["fc1"], [-8.0, 8.0]),
        (p["motionhead"]["offset_head"]["fc1"], None),
    ):
        head["kernel"] = np.zeros_like(head["kernel"])
        head["bias"] = (np.zeros_like(head["bias"]) if bias is None
                        else np.asarray(bias, np.float32))
    return Predictor(cfg, variables=v)


def _blob_stream(seq_idx, t_frames, n_pts=150, n_clutter=300):
    """One T-frame sequence of the CONTINUOUS stream: three dense moving
    blobs advancing along global time (seq_idx * T + t), plus sparse
    near-ground clutter that the clustering min-points rule must drop."""
    rng = np.random.default_rng(100 + seq_idx)  # per-sequence noise
    pts, tids = [], []
    for t in range(t_frames):
        gt = seq_idx * t_frames + t
        for c0, v in zip(CENTERS, VELS):
            c = c0 + v * gt
            b = c + rng.normal(0, 0.25, (n_pts, 3))
            b[:, 2] = np.abs(b[:, 2]) * 0.2 + 0.8
            pts.append(b)
            tids.append(np.full(n_pts, t))
        g = rng.uniform(-15, 15, (n_clutter, 3))
        g[:, 2] = np.abs(g[:, 2]) * 0.05 + 0.05
        pts.append(g)
        tids.append(np.full(n_clutter, t))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(tids).astype(np.int32))


def _true_center(blob, global_frame):
    return CENTERS[blob] + VELS[blob] * global_frame


def test_tracker_over_predictor_stream(predictor):
    """End-to-end: Predictor stream -> per-frame instance centroids ->
    ClusterTracker. Every synthetic object must hold ONE stable track id
    across all sequence boundaries, and distinct objects distinct ids."""
    from pcaccumulation_tpu.track import ClusterTracker, centroids_from_labels

    t_frames = predictor.n_frames
    tracker = ClusterTracker()
    # track id assigned to the observation nearest each true object,
    # per global frame
    id_per_blob: dict[int, list[int]] = {b: [] for b in range(len(CENTERS))}

    scans = [_blob_stream(s, t_frames) for s in range(N_SEQ)]
    for s, out in enumerate(predictor.predict_stream(iter(scans))):
        assert out["inst_labels"].max() >= len(CENTERS), (
            s, out["inst_labels"].max())
        obs, infos = centroids_from_labels(
            out["points"], out["time_idx"], out["inst_labels"], t_frames)
        for t in range(t_frames):
            _, assigned = tracker.update(obs[t], infos[t])
            gt_frame = s * t_frames + t
            for b in range(len(CENTERS)):
                # xy only: blobs are lifted to z ~ 0.84 by the ground
                # clearance in _blob_stream
                d = np.linalg.norm(
                    (obs[t] - _true_center(b, gt_frame))[:, :2], axis=1)
                assert d.min() < 0.5, (s, t, b, d.min())
                id_per_blob[b].append(int(assigned[int(d.argmin())]))

    n_frames_total = N_SEQ * t_frames
    ids_used = set()
    for b, ids in id_per_blob.items():
        assert len(ids) == n_frames_total
        # one stable id for the whole stream (frame 0 births the track
        # and keeps it: association is by position+velocity, so the
        # sequence boundary must be invisible to the tracker)
        assert len(set(ids)) == 1, (b, ids)
        ids_used.add(ids[0])
    assert len(ids_used) == len(CENTERS)  # distinct objects, distinct ids

    # the retired-track records agree: flush and check per-track history
    tracks = tracker.flush()
    confirmed = [t for t in tracks if t["confirmed"]]
    assert len(confirmed) == len(CENTERS)
    for tr in confirmed:
        assert tr["track_length"] == n_frames_total
        # history carries the pipeline's instance ids + point counts
        assert all(h["n_points"] > 100 for h in tr["track_history"])


def test_centroids_from_labels_contract(predictor):
    """The bridge helper alone: shapes, background exclusion, info keys."""
    from pcaccumulation_tpu.track import centroids_from_labels

    t_frames = predictor.n_frames
    out = predictor.predict(*_blob_stream(0, t_frames))
    obs, infos = centroids_from_labels(
        out["points"], out["time_idx"], out["inst_labels"], t_frames)
    assert len(obs) == len(infos) == t_frames
    for t in range(t_frames):
        assert obs[t].shape == (len(infos[t]), 3)
        for c, inf in zip(obs[t], infos[t]):
            assert inf["frame_id"] == t
            k = inf["instance_id"]
            assert k >= 1
            m = (out["inst_labels"] == k) & (out["time_idx"] == t)
            assert inf["n_points"] == m.sum()
            np.testing.assert_allclose(c, out["points"][m].mean(0),
                                       rtol=1e-6)
