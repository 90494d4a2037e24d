import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcaccumulation_tpu.config import load_config
from pcaccumulation_tpu.data.synthetic import generate_sample
from pcaccumulation_tpu.data.dataset import prep_sample
from pcaccumulation_tpu.data.loader import collate
from pcaccumulation_tpu.models import MotionNet
from pcaccumulation_tpu.train.loss import fuse_loss


def tiny_cfg():
    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-8, -8, -5, 8, 8, 3], "voxel_size": [0.25, 0.25, 8],
         "n_sweeps": 3, "crop_range": [8, -5, 3]}
    )
    cfg["capacity"] = {"max_points": 6000, "max_pillars": 4000, "max_instances": 8}
    cfg["data"].update({"n_frames": 3, "freq": 10.0, "max_speed": 20})
    cfg["pose_estimation"]["n_kpts"] = 128
    cfg["tpointnet"]["n_iterations"] = 2
    cfg["tpointnet"]["min_points"] = 5
    # the behavioural tests don't need production model capacity, and on
    # the single-core CI host XLA compile time scales with graph size:
    # shrink the op-graph (full-depth parity is covered separately by
    # tests/test_s2d.py and tests/test_convert.py)
    cfg["unet"]["depth"] = 3
    cfg["pillar_encoder"]["depth"] = 2
    cfg["pose_estimation"]["sinkhorn_iter"] = 2
    cfg["cluster"]["bfs_iters"] = 8
    from pcaccumulation_tpu.config import derive

    return derive(cfg)


def tiny_batch(cfg, batch_size=1, seed=0):
    samples = []
    for i in range(batch_size):
        data = generate_sample(
            seed=seed + i, n_frames=3, freq=10.0, n_static_clusters=6,
            n_dynamic=2, pts_per_cluster=150, pts_per_object=80, area=6.0,
        )
        samples.append(prep_sample(data, cfg, augment=False))
    return collate(samples)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    batch = tiny_batch(cfg)
    model = MotionNet(cfg)
    jbatch = jax.tree.map(jnp.asarray, batch)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )
    return cfg, model, variables, jbatch


def test_forward_shapes_and_finiteness(setup):
    cfg, model, variables, batch = setup
    results = model.apply(
        variables, batch, train=False, mode="val",
        rngs={"sample": jax.random.key(2)},
    )
    b, n = batch["points"].shape[:2]
    t = cfg["voxel_generator"]["n_sweeps"]
    h = cfg["voxel_generator"]["grid_size"][1]
    assert results["fb_seg_est"].shape == (b, t, h, h, 2)
    assert results["mos_est"].shape == (b, n, 2)
    assert results["offset_est"].shape == (b, n, 2)
    assert results["ego_motion_est"].shape == (b, t, 4, 4)
    assert results["rec_est"].shape == (b, n, 3)
    for key in ("ego_l1_loss", "ego_l2_loss", "ego_rot_error", "ego_trans_error",
                "inst_l2_error", "dynamic_inst_l2_error"):
        assert np.isfinite(float(results[key])), key
    # with random weights the ego estimate is wild but must be a rigid pose
    det = np.linalg.det(np.asarray(results["ego_motion_est"])[..., :3, :3])
    np.testing.assert_allclose(det, 1.0, atol=1e-3)


def test_loss_and_grads(setup):
    cfg, model, variables, batch = setup
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        results, _ = model.apply(
            {"params": p, **other}, batch, train=True, mode="train",
            rngs={"sample": jax.random.key(3)},
            mutable=["batch_stats"],
        )
        stats = fuse_loss(
            results, batch, cfg["loss"], cfg["capacity"]["max_instances"]
        )
        return stats["loss"], stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for key in ("fb_loss", "mos_loss", "offset_loss", "obj_loss", "perm_loss"):
        assert np.isfinite(float(stats[key])), key
    # gradients flow and are finite everywhere
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.8, f"only {nonzero}/{len(leaves)} grads nonzero"


def test_metric_counters(setup):
    cfg, model, variables, batch = setup
    results = model.apply(
        variables, batch, train=False, mode="val",
        rngs={"sample": jax.random.key(2)},
    )
    stats = fuse_loss(results, batch, cfg["loss"], cfg["capacity"]["max_instances"])
    for key in ("fb_metric", "mos_metric"):
        m = stats[key]
        inter = np.asarray(m["intersection"])
        union = np.asarray(m["union"])
        assert inter.shape == (2,)
        assert np.all(inter <= union + 1e-6)


def test_egomotion_degenerate_frame_guard():
    """A frame with ZERO valid background pillars must yield an identity
    pose estimate for its pairs, finite losses, and finite grads (the
    reference avoids this by resampling at the dataset level —
    libs/dataset.py:218-219)."""
    from pcaccumulation_tpu.models.egomotion import EgoMotionHead

    b, m, c, t, n_pts = 1, 64, 16, 3, 128
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(b, m, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    mean = rng.uniform(-5, 5, size=(b, m, 3)).astype(np.float32)
    pillar_t = rng.integers(0, t, size=(b, m)).astype(np.int32)
    pillar_valid = np.ones((b, m), bool)
    bg = pillar_t != 2  # frame 2 has no background pillars at all
    points = rng.uniform(-5, 5, size=(b, n_pts, 3)).astype(np.float32)
    time_idx = rng.integers(0, t, size=(b, n_pts)).astype(np.int32)
    point_valid = np.ones((b, n_pts), bool)
    gt = np.broadcast_to(np.eye(4, dtype=np.float32), (b, t, 4, 4)).copy()

    head = EgoMotionHead(n_kpts=16, n_sweeps=t, seq_pose="skip")
    args = tuple(jnp.asarray(x) for x in (
        feats, mean, pillar_t, pillar_valid, bg, points, time_idx,
        point_valid, gt))
    variables = head.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, *args
    )
    out = head.apply(variables, *args, rngs={"sample": jax.random.key(2)})
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # pair (2 -> 0) is degenerate: must be exactly identity
    np.testing.assert_allclose(np.asarray(out["ego_motion_est"][0, 2]), np.eye(4))
    # degenerate pair's perm is identity -> zero outlier-loss contribution
    np.testing.assert_allclose(np.asarray(out["perm_matrix"][0, 1]), np.eye(16),
                               atol=1e-6)

    def loss(params):
        o = head.apply({"params": params}, *args,
                       rngs={"sample": jax.random.key(2)})
        return o["ego_l1_loss"] + jnp.sum(o["perm_matrix"])

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_forward_with_icp_enabled():
    """pose_estimation.icp + tpointnet.icp wired end-to-end: the test-mode
    forward runs with both refinements on and yields finite rigid poses."""
    cfg = tiny_cfg()
    cfg["pose_estimation"]["icp"] = True
    cfg["pose_estimation"]["icp_max_iter"] = 5
    cfg["tpointnet"]["icp"] = True
    cfg["tpointnet"]["icp_max_iter"] = 5
    cfg["tpointnet"]["icp_max_points"] = 256
    batch = tiny_batch(cfg)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )
    results = model.apply(
        variables, jbatch, train=False, mode="test",
        rngs={"sample": jax.random.key(2)},
    )
    assert np.isfinite(np.asarray(results["rec_est"])).all()
    det = np.linalg.det(np.asarray(results["ego_motion_est"])[..., :3, :3])
    np.testing.assert_allclose(det, 1.0, atol=1e-3)
    # only occupied instance slots carry meaningful poses (empty slots
    # regress near-zero quats -> degenerate matrices, as in round 1)
    labels = np.asarray(results["inst_labels_est"])
    det_i = np.linalg.det(np.asarray(results["inst_pose_est"])[..., :3, :3])
    for b in range(labels.shape[0]):
        for k in np.unique(labels[b]):
            if k > 0:
                np.testing.assert_allclose(det_i[b, k], 1.0, atol=1e-3)


def test_fg_subset_gather_matches_full_path():
    """capacity.max_fg_points gathers rec_mask points before the
    reconstruction path; with no overflow the outputs must match the
    full-N path."""
    cfg_full = tiny_cfg()
    cfg_full["capacity"]["max_fg_points"] = 0  # disabled -> all points
    batch = tiny_batch(cfg_full)
    jbatch = jax.tree.map(jnp.asarray, batch)

    cfg_sub = tiny_cfg()
    cfg_sub["capacity"]["max_fg_points"] = 2048  # >= #FG points here

    out = {}
    variables = None
    for name, cfg in (("full", cfg_full), ("sub", cfg_sub)):
        model = MotionNet(cfg)
        if variables is None:
            init_fn = jax.jit(
                lambda rngs, b: model.init(rngs, b, train=False, mode="val")
            )
            variables = init_fn(
                {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
            )
        out[name] = model.apply(
            variables, jbatch, train=False, mode="val",
            rngs={"sample": jax.random.key(2)},
        )
    np.testing.assert_allclose(
        np.asarray(out["full"]["rec_est"]), np.asarray(out["sub"]["rec_est"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(out["full"]["inst_l2_error"]), float(out["sub"]["inst_l2_error"]),
        atol=1e-5,
    )
    for k in ("l1_loss", "rot_loss"):
        np.testing.assert_allclose(
            float(out["full"]["tpointnet_loss_terms"]["0_th"][k]),
            float(out["sub"]["tpointnet_loss_terms"]["0_th"][k]),
            atol=1e-5,
        )


def test_forward_bfloat16_backbone():
    """compute_dtype=bfloat16 path (production TPU config): finite
    outputs, f32 heads/losses, rigid ego poses."""
    cfg = tiny_cfg()
    cfg["precision"]["compute_dtype"] = "bfloat16"
    batch = tiny_batch(cfg)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )
    results = model.apply(
        variables, jbatch, train=False, mode="val",
        rngs={"sample": jax.random.key(2)},
    )
    assert results["mos_est"].dtype == jnp.float32
    assert results["rec_est"].dtype == jnp.float32
    assert np.isfinite(np.asarray(results["rec_est"])).all()
    for key in ("ego_l1_loss", "inst_l2_error"):
        assert np.isfinite(float(results[key])), key
    det = np.linalg.det(np.asarray(results["ego_motion_est"])[..., :3, :3])
    np.testing.assert_allclose(det, 1.0, atol=1e-2)


@pytest.mark.parametrize("strategy", ["skip", "chain", "full"])
def test_egomotion_strategies_recover_pose(strategy):
    """All three sequence strategies (egomotion.py:195-357) recover known
    ego poses when descriptors are pose-invariant and shared across
    frames (the verify-skill synthetic registration scenario)."""
    from scipy.spatial.transform import Rotation

    from pcaccumulation_tpu.models.egomotion import EgoMotionHead
    from pcaccumulation_tpu.ops import se3 as se3_ops

    rng = np.random.default_rng(3)
    t_frames, per, c = 3, 128, 32
    base = (rng.random((per, 3)) * 20 - 10).astype(np.float32)
    feats_shared = rng.normal(size=(per, c)).astype(np.float32)
    feats_shared /= np.linalg.norm(feats_shared, axis=-1, keepdims=True)

    poses = [np.eye(4, dtype=np.float32)]
    for t in range(1, t_frames):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = Rotation.from_euler("z", 2.0 * t, degrees=True).as_matrix()
        p[:3, 3] = [0.3 * t, -0.2 * t, 0.0]
        poses.append(p)  # frame t sensor -> anchor

    mean_list, t_list = [], []
    for t in range(t_frames):
        inv = np.linalg.inv(poses[t])
        mean_list.append((base @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32))
        t_list.append(np.full(per, t, np.int32))
    pillar_mean = np.concatenate(mean_list)[None]
    pillar_t = np.concatenate(t_list)[None]
    pillar_feats = np.tile(feats_shared, (t_frames, 1))[None]
    m = pillar_mean.shape[1]
    valid = np.ones((1, m), bool)
    gt = np.stack(poses)[None]
    pts = np.zeros((1, 8, 3), np.float32)
    tid = np.zeros((1, 8), np.int32)
    pv = np.ones((1, 8), bool)

    head = EgoMotionHead(n_kpts=per, n_sweeps=t_frames, seq_pose=strategy)
    args = tuple(jnp.asarray(x) for x in (
        pillar_feats, pillar_mean, pillar_t, valid, valid, pts, tid, pv, gt))
    variables = head.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, *args
    )
    out = head.apply(variables, *args, rngs={"sample": jax.random.key(2)})
    est = np.asarray(out["ego_motion_est"][0])
    for t in range(1, t_frames):
        rot_err = float(se3_ops.rotation_error_deg(
            jnp.asarray(est[t, :3, :3]), jnp.asarray(poses[t][:3, :3])))
        trans_err = float(np.linalg.norm(est[t, :3, 3] - poses[t][:3, 3]))
        assert rot_err < 0.5, (strategy, t, rot_err)
        assert trans_err < 0.1, (strategy, t, trans_err)
    assert float(out["ego_rot_error"]) < 0.5


def test_sampling_deviations_pose_error_parity():
    """Statistical sanity for the documented keypoint-draw deviations
    (models/egomotion.py module docstring): (1) the random draw's marginal
    over background pillars is uniform (chi-square), and (2) reusing one
    draw per frame across pairs + duplicating the first drawn pillar on
    shortfall yields the same pose-error distribution as the reference's
    per-pair re-draw + duplicate-last rule (egomotion.py:155-167)."""
    from scipy.spatial.transform import Rotation

    from pcaccumulation_tpu.models.egomotion import draw_keypoints
    from pcaccumulation_tpu.ops import se3 as se3_ops
    from pcaccumulation_tpu.ops.kabsch import weighted_kabsch
    from pcaccumulation_tpu.ops.sinkhorn import log_sinkhorn, square_distance

    # ---- (1) marginal uniformity ---------------------------------------
    m, n_valid, n_draw, n_seeds = 600, 400, 64, 800
    mask = jnp.zeros((1, 1, m), bool).at[:, :, :n_valid].set(True)

    @jax.jit
    def one_draw(key):
        idx = draw_keypoints(key, mask, n_draw, approx=False,
                             deterministic=False)
        return jnp.zeros(m, jnp.int32).at[idx.reshape(-1)].add(1)

    counts = np.stack([
        np.asarray(one_draw(jax.random.key(s))) for s in range(n_seeds)
    ]).sum(0)
    assert counts[n_valid:].sum() == 0  # never draws masked rows
    expected = n_seeds * n_draw / n_valid
    chi2 = float(((counts[:n_valid] - expected) ** 2 / expected).sum())
    # chi2 ~ ChiSq(n_valid - 1): mean 399, std ~28; 6 sigma ~ [230, 570]
    assert 230 < chi2 < 570, chi2

    # ---- (2) pose-error distribution: reuse vs per-pair redraw ---------
    rng = np.random.default_rng(7)
    per, c, n_kpts = 300, 16, 256  # shortfall regime: duplication active
    base = (rng.random((per, 3)) * 20 - 10).astype(np.float32)
    feats0 = rng.normal(size=(per, c)).astype(np.float32)
    feats0 /= np.linalg.norm(feats0, axis=-1, keepdims=True)
    feats = feats0 + rng.normal(size=(per, c)).astype(np.float32) * 0.15
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("z", 3.0, degrees=True).as_matrix()
    pose[:3, 3] = [0.4, -0.3, 0.0]
    inv = np.linalg.inv(pose)
    src_pts = (base @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    coords = jnp.asarray(np.stack([base, src_pts]))   # [2, per, 3]
    fmat = jnp.asarray(np.stack([feats0, feats]))     # [2, per, C]
    fmask = jnp.ones((1, 2, per), bool)

    @functools.partial(jax.jit, static_argnames=("dup_last",))
    def pose_err(key_t, key_s, dup_last):
        idx_t = draw_keypoints(key_t, fmask[:, :1], n_kpts, approx=False,
                               deterministic=False)[0, 0]
        idx_s = draw_keypoints(key_s, fmask[:, 1:], n_kpts, approx=False,
                               deterministic=False)[0, 0]
        if dup_last:  # reference shortfall rule: duplicate the LAST point
            idx_t = jnp.where(jnp.arange(n_kpts) < per, idx_t, per - 1)
            idx_s = jnp.where(jnp.arange(n_kpts) < per, idx_s, per - 1)
        ct, cs = coords[0][idx_t], coords[1][idx_s]
        ft, fs = fmat[0][idx_t], fmat[1][idx_s]
        aff = -(square_distance(fs[None], ft[None], normalised=True) + 5.0)
        perm = jnp.exp(log_sinkhorn(aff, n_iters=3, slack=True))[0]
        row = perm.sum(-1)
        wt = perm @ ct / (row[:, None] + 1e-20)
        rot, _ = weighted_kabsch(cs[None], wt[None], row[None])
        return se3_ops.rotation_error_deg(rot[0], jnp.asarray(pose[:3, :3]))

    n_rep = 48
    reuse, redraw, duplast = [], [], []
    for s in range(n_rep):
        k1, k2, k3 = (jax.random.key(3 * s + i) for i in range(3))
        reuse.append(float(pose_err(k1, k2, False)))
        redraw.append(float(pose_err(k3, k2, False)))   # tgt re-drawn
        duplast.append(float(pose_err(k1, k2, True)))
    reuse, redraw, duplast = map(np.asarray, (reuse, redraw, duplast))
    for other, name in ((redraw, "per-pair redraw"), (duplast, "dup-last")):
        sem = np.sqrt(reuse.var() / n_rep + other.var() / n_rep)
        assert abs(reuse.mean() - other.mean()) < 4 * sem + 1e-3, (
            name, reuse.mean(), other.mean(), sem)


def test_test_mode_batch_independence(setup):
    """mode="test" at B=2 must equal the two B=1 runs element-for-element:
    no cross-sequence leakage through the on-device clustering, instance
    reconstruction, or BN (inference uses running stats). This is the
    correctness prerequisite for batching the serving graph (VERDICT r4
    Missing #2) independent of whether batching ever pays on-chip.

    deterministic_sampling: the default gumbel keypoint draw consumes one
    rng across the whole [B, T, M] mask, so its per-element indices are
    batch-shape-dependent by construction — the parity-mode scan-order
    draw removes exactly that, leaving any remaining mismatch a real
    leak."""
    cfg, _, variables, _ = setup
    import copy

    cfg = copy.deepcopy(cfg)
    cfg["pose_estimation"]["deterministic_sampling"] = True
    model = MotionNet(cfg)
    b2 = jax.tree.map(jnp.asarray, tiny_batch(cfg, batch_size=2, seed=0))
    singles = [
        jax.tree.map(jnp.asarray, tiny_batch(cfg, batch_size=1, seed=s))
        for s in (0, 1)
    ]

    keys = ("ego_motion_est", "rec_est", "mos_est", "fb_est_per_points",
            "inst_labels_est", "offset_est")

    def fwd(v, b):
        r = model.apply(v, b, train=False, mode="test",
                        rngs={"sample": jax.random.key(5)})
        return {k: r[k] for k in keys}

    fwd_jit = jax.jit(fwd)
    out2 = jax.device_get(fwd_jit(variables, b2))
    for i, b1 in enumerate(singles):
        out1 = jax.device_get(fwd_jit(variables, b1))
        for k in ("ego_motion_est", "rec_est", "mos_est", "offset_est"):
            np.testing.assert_allclose(
                out2[k][i], out1[k][0], atol=1e-4, err_msg=(k, i))
        for k in ("fb_est_per_points", "inst_labels_est"):
            np.testing.assert_array_equal(
                out2[k][i], out1[k][0], err_msg=str((k, i)))


def test_temporal_banded_conv_matches_conv3d():
    """TemporalBandedConv (T folded into channels, block-banded 2-D kernel)
    must reproduce nn.Conv(C, (3,3,3)) exactly with the SAME param pytree."""
    import flax.linen as nn
    from pcaccumulation_tpu.models.stpn import TemporalBandedConv

    b, t, h, w, c = 2, 4, 10, 12, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))

    ref = nn.Conv(c, (3, 3, 3), padding=1)
    ref_vars = ref.init(jax.random.key(0), x)

    banded = TemporalBandedConv(c, t)
    x_fold = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    out_fold = banded.apply({"params": ref_vars["params"]}, x_fold)
    out = out_fold.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)

    ref_out = ref.apply(ref_vars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)


def test_folded_seg_head_matches_seg_head2d():
    """FoldedSegHead2D on the folded [B,H,W,T*C] canvas must reproduce
    SegHead2D on the unfolded [B*T,H,W,C] input with the SAME params —
    outputs AND updated BatchNorm statistics (train mode)."""
    from pcaccumulation_tpu.models.layers import FoldedSegHead2D, SegHead2D

    b, t, h, w, c, out = 2, 4, 8, 10, 6, 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))

    ref = SegHead2D(out)
    ref_vars = ref.init(jax.random.key(0), x.reshape(b * t, h, w, c))
    folded_mod = FoldedSegHead2D(out, n_frames=t)

    x_fold = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    for train in (False, True):
        ref_out, ref_mut = ref.apply(
            ref_vars, x.reshape(b * t, h, w, c), train=train,
            mutable=["batch_stats"])
        our_out, our_mut = folded_mod.apply(
            ref_vars, x_fold, train=train, mutable=["batch_stats"])
        our_unf = (
            our_out.reshape(b, h, w, t, out).transpose(0, 3, 1, 2, 4)
            .reshape(b * t, h, w, out)
        )
        np.testing.assert_allclose(np.asarray(our_unf), np.asarray(ref_out),
                                   atol=3e-5, err_msg=f"train={train}")
        for leaf_ref, leaf_our in zip(
            jax.tree.leaves(ref_mut), jax.tree.leaves(our_mut)
        ):
            np.testing.assert_allclose(np.asarray(leaf_our),
                                       np.asarray(leaf_ref), atol=1e-5)


def test_narrow_conv_matches_nn_conv():
    """NarrowConv3x3 (kernel zero-padded to 128 lanes, slice deferred) must
    reproduce nn.Conv(features, (3,3)) with the SAME param pytree; the
    padded channels must be exactly zero."""
    import flax.linen as nn
    from pcaccumulation_tpu.models.layers import NarrowConv3x3

    b, h, w, cin, co = 2, 12, 10, 16, 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))

    ref = nn.Conv(co, (3, 3), padding=1)
    ref_vars = ref.init(jax.random.key(0), x)
    ref_out = ref.apply(ref_vars, x)

    ours = NarrowConv3x3(co).apply({"params": ref_vars["params"]}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_out),
                               atol=1e-5)

    padded = NarrowConv3x3(co, keep_padded=True).apply(
        {"params": ref_vars["params"]}, x)
    assert padded.shape[-1] == 128
    np.testing.assert_allclose(np.asarray(padded[..., :co]),
                               np.asarray(ref_out), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(padded[..., co:]), 0.0)


def test_fb_loss_pillar_rows_match_map_rows(setup):
    """The FB loss now consumes [B, M, 2] pillar rows; the reference
    formulation masks the full BEV map by occupancy. One occupied pillar
    == one masked map cell, so CE + Lovasz + IoU counters must agree."""
    from pcaccumulation_tpu.train.loss import seg_loss

    cfg, model, variables, batch = setup
    results = model.apply(
        variables, batch, train=False, mode="val",
        rngs={"sample": jax.random.key(2)},
    )
    occ = results["occ_map"][..., 0] == 1
    map_stats = seg_loss(
        results["fb_seg_est"].reshape(-1, 2),
        results["fb_seg_gt"][..., 0].astype(jnp.int32).reshape(-1),
        occ.reshape(-1),
    )
    pil_stats = seg_loss(
        results["fb_logit_pillar"].reshape(-1, 2),
        results["fb_pillar_gt"].astype(jnp.int32).reshape(-1),
        batch["pillar_valid"].reshape(-1),
    )
    for k in ("bce_loss", "lovasz_loss"):
        np.testing.assert_allclose(float(pil_stats[k]), float(map_stats[k]),
                                   rtol=2e-4, err_msg=k)
    for k in ("intersection", "union"):
        np.testing.assert_allclose(np.asarray(pil_stats["metric"][k]),
                                   np.asarray(map_stats["metric"][k]),
                                   rtol=1e-5, err_msg=k)


def test_subset_loss_matches_map_loss():
    """With max_fg_points set (and not exceeded), the MOS/offset losses
    computed on the decoded-subset rows must equal the full-map
    formulation: the subset rows ARE the masked rows."""
    from pcaccumulation_tpu.train.loss import fuse_loss

    cfg_full = tiny_cfg()
    batch = tiny_batch(cfg_full)
    jbatch = jax.tree.map(jnp.asarray, batch)

    cfg_sub = tiny_cfg()
    cfg_sub["capacity"] = dict(cfg_sub["capacity"], max_fg_points=2048)

    model_full = MotionNet(cfg_full)
    model_sub = MotionNet(cfg_sub)
    init_fn = jax.jit(
        lambda rngs, b: model_full.init(rngs, b, train=False, mode="val")
    )
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )

    outs = {}
    for name, mdl in (("full", model_full), ("sub", model_sub)):
        res = mdl.apply(variables, jbatch, train=False, mode="val",
                        rngs={"sample": jax.random.key(2)})
        outs[name] = fuse_loss(res, jbatch, cfg_full["loss"],
                               cfg_full["capacity"]["max_instances"])
    assert "mos_sub" not in (None,)  # structure sanity
    for k in ("mos_loss", "offset_loss", "offset_l1_loss",
              "offset_dir_loss", "offset_l2_error"):
        np.testing.assert_allclose(float(outs["sub"][k]),
                                   float(outs["full"][k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)


def test_perf_knob_variants_forward_identical(setup):
    """The layout/formulation knobs (perf.densify/fold/ungrid_src,
    PROFILE_r07) must be pure performance choices: forcing the
    production-T=11 forms on the tiny graph reproduces the legacy
    forward exactly (same params, same rngs)."""
    cfg, _, variables, jbatch = setup
    import copy

    def run(perf):
        c = copy.deepcopy(cfg)
        c["perf"] = perf
        m = MotionNet(c)
        return m.apply(variables, jbatch, train=False, mode="val",
                       rngs={"sample": jax.random.key(5)})

    legacy = run({"densify": "scatter", "fold": "transpose",
                  "ungrid_src": "folded"})
    new = run({"densify": "gather", "fold": "concat",
               "ungrid_src": "tmajor"})
    for k in ("rec_est", "mos_est", "ego_motion_est", "offset_est",
              "fb_est_per_points"):
        np.testing.assert_allclose(
            np.asarray(legacy[k]), np.asarray(new[k]), atol=1e-5,
            err_msg=k,
        )


def test_stpn_band_layers_knob():
    """stpn.n_band_layers < 4 (OPT-IN speed trade, tools/PROFILE_r11.md):
    the late temporal layers move AFTER the temporal max as plain 2-D
    convs — the module builds, runs finitely, and its parameter tree
    reflects the split; the default 4 keeps the reference-parity tree
    (all init_conv*, no post_conv*)."""
    from pcaccumulation_tpu.models.stpn import STPN

    x = jnp.zeros((1, 16, 16, 3 * 8))  # T=3, C=8, folded t-minor
    pts = jnp.zeros((1, 20, 3))
    mask = jnp.ones((1, 20), bool)
    for k, want_post in ((4, 0), (2, 2)):
        m = STPN(feat_dim=8, n_frames=3, n_band_layers=k)
        v = m.init({"params": jax.random.key(0)}, x, pts, mask, -4.0)
        names = set(v["params"])
        assert sum(1 for n in names if n.startswith("post_conv")) == want_post
        assert sum(1 for n in names if n.startswith("init_conv")) == k
        cls, off, fm = m.apply(v, x, pts, mask, -4.0)
        assert cls.shape == (1, 20, 2) and off.shape == (1, 20, 2)
        assert np.isfinite(np.asarray(fm)).all()
