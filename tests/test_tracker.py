"""Tests for the AB3DMOT-style cluster tracker (pcaccumulation_tpu/track.py).

The batched struct-of-arrays Kalman math is checked against a plain
per-track loop implementation written independently here; behavior
(birth/death/association/gating) is checked on synthetic constant-velocity
scenes mirroring /root/reference/toolbox/tracker.py semantics.
"""

import numpy as np
import pytest

from pcaccumulation_tpu.track import ClusterTracker, track_scene, _cv_model


# --------------------------------------------------------------- KF math ---

class _ScalarKF:
    """Straightforward single-track KF for parity (textbook equations)."""

    def __init__(self, z0, cfg):
        s, d = cfg["state_dim"], cfg["obs_dim"]
        self.F, self.H = _cv_model(s, d)
        self.x = np.zeros(s)
        self.x[:d] = z0
        self.x[d] = cfg["vx"]
        self.P = np.eye(s)
        self.P[:d, :d] *= cfg["pos_uncertainty"]
        self.P[d:, d:] *= cfg["velocity_uncertainty"]
        self.Q = np.eye(s)
        self.Q[d:, d:] *= cfg["process_uncertainty"]
        self.R = np.eye(d)

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ (z - self.H @ self.x)
        self.P = (np.eye(len(self.x)) - K @ self.H) @ self.P


def test_batched_kf_matches_scalar_loop():
    rng = np.random.default_rng(0)
    cfg = {"mahalanobis_threshold": 1e9}  # force every match
    tracker = ClusterTracker(cfg)
    cfg_full = tracker.cfg

    z0 = rng.normal(size=(3, 3)) * 5
    refs = [_ScalarKF(z0[i], cfg_full) for i in range(3)]
    tracker.update(z0)

    # well-separated tracks with consistent motion: association is identity
    vel = np.array([[1.0, 0, 0], [0, 1.0, 0], [-1.0, 0, 0.5]])
    pos = z0.copy()
    for _ in range(6):
        pos = pos + vel
        z = pos + rng.normal(size=pos.shape) * 0.05
        for r, zi in zip(refs, z):
            r.predict()
            r.update(zi)
        tracker.update(z)

    order = np.argsort(tracker.ids)  # birth order == ref order
    for row, ref in zip(order, refs):
        np.testing.assert_allclose(tracker.x[row], ref.x, atol=1e-9)
        np.testing.assert_allclose(tracker.P[row], ref.P, atol=1e-9)


def test_velocity_is_recovered():
    frames = [np.array([[2.0 * t, -1.0 * t, 0.5 * t]]) for t in range(12)]
    tracks, assigned = track_scene(frames)
    assert len(tracks) == 1
    state = tracks[0]["state"]
    np.testing.assert_allclose(state[3:], [2.0, -1.0, 0.5], atol=1e-2)
    # single object keeps one id throughout
    ids = np.concatenate(assigned)
    assert (ids == ids[0]).all()


# ------------------------------------------------------------- lifecycle ---

def test_birth_death_and_confirmation():
    tracker = ClusterTracker({"max_age": 2, "min_hits": 2})
    dead, ids = tracker.update(np.array([[0.0, 0, 0]]))
    assert tracker.n_tracks == 1 and not dead and ids.tolist() == [0]

    # second hit -> confirmed
    tracker.update(np.array([[0.1, 0, 0]]))
    # two empty frames -> retired
    dead1, _ = tracker.update(np.zeros((0, 3)))
    dead2, _ = tracker.update(np.zeros((0, 3)))
    dead = dead1 + dead2
    assert len(dead) == 1 and tracker.n_tracks == 0
    assert dead[0]["confirmed"] and dead[0]["track_length"] == 2
    assert dead[0]["tracker_id"] == 0

    # a one-hit wonder retires unconfirmed
    tracker.update(np.array([[5.0, 5, 5]]), [{"score": 0.7, "instance_id": 9}])
    for _ in range(2):
        dead, _ = tracker.update(np.zeros((0, 3)))
    assert len(dead) == 1 and not dead[0]["confirmed"]
    assert dead[0]["instance_ids"] == [9]
    assert dead[0]["track_score"] == pytest.approx(0.7)


def test_mahalanobis_gate_spawns_instead_of_matching():
    # shrink the velocity-uncertainty block so the innovation covariance is
    # tight: with the AB3DMOT default (1000) a brand-new track legitimately
    # swallows observations 50 m away (S ~ 1e3 -> d_M ~ 1.6)
    tracker = ClusterTracker({"mahalanobis_threshold": 2.0,
                              "velocity_uncertainty": 1.0,
                              "pos_uncertainty": 1.0})
    tracker.update(np.array([[0.0, 0, 0]]))
    # far-away observation must NOT associate to the existing track
    _, ids = tracker.update(np.array([[50.0, 0, 0]]))
    assert tracker.n_tracks == 2 and ids.tolist() == [1]


def test_two_crossing_objects_keep_identity():
    # two objects approach, pass, and separate; velocity in the state lets
    # Mahalanobis association keep their ids straight through the crossing
    ts = np.arange(14, dtype=np.float64)
    a = np.stack([ts, np.zeros_like(ts), np.zeros_like(ts)], 1)         # ->
    b = np.stack([13 - ts, 0.3 * np.ones_like(ts), np.zeros_like(ts)], 1)
    frames = [np.stack([a[t], b[t]]) for t in range(14)]
    tracks, assigned = track_scene(frames)
    assert len(tracks) == 2
    ids = np.stack(assigned)  # [T, 2]
    assert (ids[:, 0] == ids[0, 0]).all() and (ids[:, 1] == ids[0, 1]).all()
    assert ids[0, 0] != ids[0, 1]


def test_greedy_and_hungarian_agree_when_separated():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 3)) * 40
    vel = rng.normal(size=(5, 3)) * 0.5
    frames = [base + t * vel + rng.normal(size=base.shape) * 0.02
              for t in range(8)]
    out = {}
    for algo in ("greedy", "hungarian"):
        # shuffle observation order per frame to exercise association
        perm_frames, perms = [], []
        rng2 = np.random.default_rng(7)
        for f in frames:
            p = rng2.permutation(5)
            perm_frames.append(f[p])
            perms.append(p)
        _, assigned = track_scene(perm_frames,
                                  config={"match_algorithm": algo})
        # unshuffle: id assigned to object k at frame t
        out[algo] = np.stack([ids[np.argsort(p)]
                              for ids, p in zip(assigned, perms)])
    np.testing.assert_array_equal(out["greedy"], out["hungarian"])
    # every object keeps a constant id
    for col in out["greedy"].T:
        assert (col == col[0]).all()


def test_2d_state_layout():
    frames = [np.array([[1.0 * t, 2.0 * t]]) for t in range(8)]
    tracks, _ = track_scene(frames, config={"state_dim": 4, "obs_dim": 2})
    assert len(tracks) == 1
    np.testing.assert_allclose(tracks[0]["state"][2:], [1.0, 2.0], atol=1e-2)


def test_empty_scene_and_clear():
    tracker = ClusterTracker()
    dead, ids = tracker.update(np.zeros((0, 3)))
    assert not dead and ids.size == 0 and tracker.n_tracks == 0
    tracker.update(np.array([[1.0, 1, 1]]))
    tracker.clear()
    assert tracker.n_tracks == 0
    # ids keep counting after clear (reference's class-level counter)
    _, ids = tracker.update(np.array([[0.0, 0, 0]]))
    assert ids.tolist() == [1]
