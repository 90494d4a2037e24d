"""Offline scene-flow evaluation CLI: metric definitions + scene
aggregation (regression for the round-2 KeyError on scenes with
heterogeneous category sets)."""

import numpy as np

from pcaccumulation_tpu.train.sf_metrics import compute_sf_metrics
from evaluation import collect_results, update_stats_meter_listaware


def test_compute_sf_metrics_definitions():
    epe = np.array([0.01, 0.07, 0.2, 0.5])
    rel = np.array([0.01, 0.20, 0.04, 0.5])
    m = compute_sf_metrics(epe, rel)
    assert m["EPE3D"] == [np.mean(epe), 4]
    assert m["EPE3D_med"] == np.median(epe)
    # Acc3DS: epe<0.05 or rel<0.05 -> points 0, 2
    assert m["Acc3DS"][0] == 0.5
    # Acc3DR: epe<0.1 or rel<0.1 -> points 0, 1, 2
    assert m["Acc3DR"][0] == 0.75
    # Outlier: epe>0.3 or rel>0.1 -> points 1, 3
    assert m["Outlier"][0] == 0.5
    # ROutlier: epe>0.3 and rel>0.3 -> point 3
    assert m["ROutlier"][0] == 0.25
    empty = compute_sf_metrics(np.zeros(0), np.zeros(0))
    assert empty["EPE3D"] == [0.0, 0]


def _write_scene(root, name, n, fb_frac=0.3, sd_frac=0.2, n_frames=3, epe=0.1,
                 rng=None):
    rng = rng or np.random.default_rng(0)
    d = root / name
    d.mkdir(parents=True)
    fb = np.zeros(n, bool)
    fb[: int(n * fb_frac)] = True
    sd = np.zeros(n, bool)
    sd[: int(n * sd_frac)] = True
    np.savez(
        d / "flow_error.npz",
        fb_label=fb,
        sd_label=sd,
        epe_per_point=np.full(n, epe, np.float16),
        relative_error=np.full(n, epe, np.float16),
        time_indice=rng.integers(0, n_frames, n).astype(np.int8),
    )


def test_collect_results_heterogeneous_scenes(tmp_path):
    """Scene 1 has no static-FG points and fewer frames than scene 2 —
    aggregation must create missing sub-meters instead of KeyError."""
    res = tmp_path / "results" / "exp"
    _write_scene(res, "sceneA", 100, fb_frac=0.0, sd_frac=0.0, n_frames=2,
                 epe=0.2)
    _write_scene(res, "sceneB", 300, fb_frac=0.5, sd_frac=0.25, n_frames=5,
                 epe=0.05)
    meter, epe_dyn, rel_dyn = collect_results(
        str(res), str(tmp_path / "metrics" / "exp"), "synthetic"
    )
    assert "static_FG" in meter  # only scene B contributes
    np.testing.assert_allclose(meter["static_FG"]["EPE3D"].avg, 0.05, rtol=1e-2)
    # weighted mean over scenes: (100*0.2 + 225*0.05) / 325
    expected = (100 * 0.2 + 225 * 0.05) / 325
    np.testing.assert_allclose(
        meter["static_overall"]["EPE3D"].avg, expected, rtol=1e-2
    )
    assert len(epe_dyn) == 75  # scene B's dynamic points


# ------------------------------------------------------------ SFEvaluator ---

def test_sf_evaluator_full_breakdown(tmp_path):
    from pcaccumulation_tpu.train.sf_metrics import (
        SFEvaluator, load_and_display)
    rng = np.random.default_rng(0)
    n_frames = 3
    ev = SFEvaluator(n_frames, save_dir=str(tmp_path))

    # two scenes; flow errors drawn so category stats are predictable
    for scene in range(2):
        n = 600
        gt = rng.normal(size=(n, 3)).astype(np.float32)
        noise = rng.normal(scale=0.02, size=(n, 3)).astype(np.float32)
        est = gt + noise
        tid = rng.integers(0, n_frames, n)
        fb = rng.random(n) < 0.3
        sd = fb & (rng.random(n) < 0.5)
        ev.update(gt, est, tid, fb, sd)

    res = ev.full_evaluation(display=False)
    assert set(res) == {"overall", "1-th frame", "2-th frame"}
    ov = res["overall"]
    assert ov["n_points"] == 1200
    for cat in ("overall", "BG", "FG", "Static", "Dynamic"):
        for k in ("EPE3D", "Acc3DS", "Acc3DR", "Outlier", "ROutlier"):
            assert np.isfinite(ov[cat][k])
    # tiny noise -> high accuracy, low outliers
    assert ov["overall"]["Acc3DS"] > 0.8
    assert ov["overall"]["Outlier"] < 0.1
    # percentiles are monotone
    pct = [ov["percentile"][f"{t}%"] for t in (10, 25, 50, 75, 90)]
    assert all(a <= b for a, b in zip(pct, pct[1:]))
    # pkl written and displayable
    assert (tmp_path / "sf_results.pkl").exists()
    load_and_display(str(tmp_path / "sf_results.pkl"))


def test_sf_evaluator_mask_and_precomputed_paths_agree():
    from pcaccumulation_tpu.train.sf_metrics import SFEvaluator
    rng = np.random.default_rng(1)
    n = 400
    gt = rng.normal(size=(n, 3)).astype(np.float32)
    est = gt + rng.normal(scale=0.1, size=(n, 3)).astype(np.float32)
    tid = rng.integers(0, 2, n)
    fb = rng.random(n) < 0.4
    sd = rng.random(n) < 0.2
    mask = rng.random(n) < 0.7

    a = SFEvaluator(2)
    a.update(gt, est, tid, fb, sd, mask=mask)
    ra = a.full_evaluation(display=False)

    err = np.linalg.norm(est - gt, axis=1)
    rel = err / (np.linalg.norm(gt, axis=1) + 1e-7)
    b = SFEvaluator(2)
    b.update(gt, est, tid, fb, sd, mask=mask,
             relative_error=rel, epe_per_point=err)
    rb = b.full_evaluation(display=False)
    assert ra["overall"]["n_points"] == int(mask.sum())
    np.testing.assert_allclose(
        ra["overall"]["overall"]["EPE3D"],
        rb["overall"]["overall"]["EPE3D"], rtol=1e-3)
