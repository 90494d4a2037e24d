"""Pins the bf16-backbone accuracy claim (bench.py: "checkpoint-val drift
negligible, mos/fb decisions identical, ego rot 0.293 -> 0.297 deg").

bench.py runs the flagship config with precision.compute_dtype=bfloat16;
this CPU-sized test enforces the claim's substance on every CI run: the
SAME parameters applied through the bf16 graph must reproduce the f32
graph's decisions (mos/fb argmax) and keep ego errors within the drift
the bench comment states — so a future cast moving across a reduction
fails CI instead of silently changing the headline number.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.config import derive, load_config
from pcaccumulation_tpu.data.dataset import prep_sample
from pcaccumulation_tpu.data.loader import collate
from pcaccumulation_tpu.data.synthetic import generate_sample
from pcaccumulation_tpu.models import MotionNet


def _cfg(compute_dtype):
    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-8, -8, -5, 8, 8, 3], "voxel_size": [0.25, 0.25, 8],
         "n_sweeps": 3, "crop_range": [8, -5, 3]}
    )
    cfg["capacity"] = {"max_points": 6000, "max_pillars": 4000,
                       "max_instances": 8, "max_fg_points": 1024}
    cfg["data"].update({"n_frames": 3, "freq": 10.0, "max_speed": 20})
    cfg["pose_estimation"]["n_kpts"] = 128
    cfg["tpointnet"].update({"n_iterations": 1, "min_points": 5})
    cfg["unet"]["depth"] = 3
    cfg["pillar_encoder"]["depth"] = 2
    cfg["pose_estimation"]["sinkhorn_iter"] = 2
    cfg["cluster"]["bfs_iters"] = 8
    cfg["precision"] = {"compute_dtype": compute_dtype}
    return derive(cfg)


def test_bf16_backbone_matches_f32_forward():
    cfg32 = _cfg("float32")
    cfg16 = _cfg("bfloat16")
    batch = collate([
        prep_sample(
            generate_sample(seed=42, n_frames=3, freq=10.0,
                            n_static_clusters=8, n_dynamic=2,
                            pts_per_cluster=150, pts_per_object=90, area=6.0),
            cfg32, augment=False,
        )
    ])
    jbatch = jax.tree.map(jnp.asarray, batch)

    m32, m16 = MotionNet(cfg32), MotionNet(cfg16)
    # NarrowConv3x3 / the packed heads keep the identical param pytree as
    # their wide forms (models/layers.py:199), so ONE init serves both
    variables = jax.jit(
        lambda rngs, b: m32.init(rngs, b, train=False, mode="val")
    )({"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch)

    # same "sample" key -> identical keypoint draws in both graphs
    r32 = jax.jit(lambda v, b: m32.apply(
        v, b, train=False, mode="val", rngs={"sample": jax.random.key(2)}))(
        variables, jbatch)
    r16 = jax.jit(lambda v, b: m16.apply(
        v, b, train=False, mode="val", rngs={"sample": jax.random.key(2)}))(
        variables, jbatch)

    valid = np.asarray(batch["point_valid"][0], bool)

    # params stay f32 in both graphs
    assert jax.tree.leaves(variables["params"])[0].dtype == jnp.float32
    # the bf16 graph genuinely computed in bf16 somewhere: outputs differ
    # at bf16-noise level but not zero (guards against a silently-f32 path)
    fb32 = np.asarray(r32["fb_seg_est"], np.float32)
    fb16 = np.asarray(r16["fb_seg_est"], np.float32)
    assert 0 < np.abs(fb16 - fb32).max() < 0.15, np.abs(fb16 - fb32).max()

    # decisions identical (the bench claim: "mos_iou/fb_iou identical")
    fbp32 = np.asarray(r32["fb_est_per_points"])[0][valid]
    fbp16 = np.asarray(r16["fb_est_per_points"])[0][valid]
    assert (fbp32 == fbp16).mean() >= 0.999, (fbp32 != fbp16).sum()
    mos32 = np.argmax(np.asarray(r32["mos_est"], np.float32)[0][valid], -1)
    mos16 = np.argmax(np.asarray(r16["mos_est"], np.float32)[0][valid], -1)
    assert (mos32 == mos16).mean() >= 0.995, (mos32 != mos16).sum()

    # ego errors drift within tolerance. The bench claim (0.293 -> 0.297
    # deg = 1.4% relative on checkpoint weights) is enforced RELATIVELY:
    # this test runs random-init weights, where the absolute error sits at
    # ~3.5 deg and bf16 noise through the soft-assignment pipeline scales
    # with it — 5% relative (measured drift: ~2.8%) fails on a cast moved
    # across a reduction while passing bf16 rounding noise.
    rot32, rot16 = float(r32["ego_rot_error"]), float(r16["ego_rot_error"])
    trans32, trans16 = float(r32["ego_trans_error"]), float(r16["ego_trans_error"])
    assert abs(rot16 - rot32) < max(0.02, 0.05 * rot32), (rot16, rot32)
    assert abs(trans16 - trans32) < max(2e-3, 0.05 * trans32), (trans16, trans32)
    np.testing.assert_allclose(
        np.asarray(r16["ego_motion_est"]), np.asarray(r32["ego_motion_est"]),
        atol=5e-2)

    # reconstruction stays metrically close
    rec32 = np.asarray(r32["rec_est"])[0][valid]
    rec16 = np.asarray(r16["rec_est"])[0][valid]
    assert np.abs(rec16 - rec32).max() < 0.05, np.abs(rec16 - rec32).max()
