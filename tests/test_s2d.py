"""Space-to-depth conv reformulation: exact-equivalence tests.

The UNet's level-0 (full-resolution, narrowest-channel) convs can run in
s2d layout (ops/s2d.py, models/unet.py) — same parameters, 4x-wide MXU-
filling convs. These tests pin the transform to the plain-layout modules
it replaces; reference architecture at /root/reference/models/unet.py.
"""

import flax.linen as nn
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from pcaccumulation_tpu.models.unet import S2DConv3x3, S2DUpsample2x2, UNet
from pcaccumulation_tpu.ops.s2d import (
    depth_to_space,
    s2d_group_max_pool,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8, 3))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_conv3x3_matches_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 12, 6))
    conv = nn.Conv(7, (3, 3), padding=1)
    v = conv.init(jax.random.PRNGKey(1), x)
    ref = conv.apply(v, x)
    got = depth_to_space(S2DConv3x3(7).apply(v, space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-6, rtol=1e-5)


def test_s2d_upsample_matches_convtranspose():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 4))
    ct = nn.ConvTranspose(3, (2, 2), strides=(2, 2))
    v = ct.init(jax.random.PRNGKey(1), x)
    ref = ct.apply(v, x)
    got = depth_to_space(S2DUpsample2x2(3).apply(v, x))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-6, rtol=1e-5)


def test_s2d_group_max_pool_matches_maxpool():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = s2d_group_max_pool(space_to_depth(x), 5)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("depth", [2, 3, 5])
def test_unet_s2d_level0_same_params_same_output(depth):
    """Same param pytree, flag on vs off -> identical function."""
    a = UNet(in_channels=4, depth=depth, start_filts=4, s2d_level0=False)
    b = UNet(in_channels=4, depth=depth, start_filts=4, s2d_level0=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    v = a.init(jax.random.PRNGKey(3), x)
    v2 = b.init(jax.random.PRNGKey(3), x)
    assert jax.tree_util.tree_map(jnp.shape, v) == \
        jax.tree_util.tree_map(jnp.shape, v2)
    np.testing.assert_allclose(
        np.asarray(a.apply(v, x)), np.asarray(b.apply(v, x)),
        atol=3e-6, rtol=1e-5,
    )


def test_unet_s2d_gradients_match():
    a = UNet(in_channels=4, depth=3, start_filts=4, s2d_level0=False)
    b = UNet(in_channels=4, depth=3, start_filts=4, s2d_level0=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    v = a.init(jax.random.PRNGKey(3), x)
    ga = jax.grad(lambda p: jnp.sum(a.apply(p, x) ** 2))(v)
    gb = jax.grad(lambda p: jnp.sum(b.apply(p, x) ** 2))(v)
    flat_a, _ = jax.flatten_util.ravel_pytree(ga)
    flat_b, _ = jax.flatten_util.ravel_pytree(gb)
    np.testing.assert_allclose(np.asarray(flat_a), np.asarray(flat_b),
                               atol=1e-4, rtol=1e-4)


def test_s2d_seghead_matches_plain_eval():
    """d2s of the packed 8 real channels == the plain narrow head map."""
    from pcaccumulation_tpu.models.layers import S2DSegHead2D, SegHead2D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 4))
    plain = SegHead2D(2, pad_narrow_out=False)
    s2d = S2DSegHead2D(2)
    v = plain.init(jax.random.PRNGKey(1), x, train=False)
    v2 = s2d.init(jax.random.PRNGKey(1), space_to_depth(x), train=False)
    assert jax.tree_util.tree_map(jnp.shape, v) == \
        jax.tree_util.tree_map(jnp.shape, v2)
    ref = plain.apply(v, x, train=False)
    packed = s2d.apply(v, space_to_depth(x), train=False)
    np.testing.assert_array_equal(np.asarray(packed[..., 8:]), 0.0)
    got = depth_to_space(packed[..., :8])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=3e-6, rtol=1e-5)


def test_s2d_seghead_matches_plain_train_stats():
    """Train mode: same outputs AND the same running-stat updates."""
    from pcaccumulation_tpu.models.layers import S2DSegHead2D, SegHead2D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 4)) * 2.0 + 0.5
    plain = SegHead2D(2, pad_narrow_out=False)
    s2d = S2DSegHead2D(2)
    v = plain.init(jax.random.PRNGKey(1), x, train=False)
    ref, mut_a = plain.apply(v, x, train=True, mutable=["batch_stats"])
    packed, mut_b = s2d.apply(v, space_to_depth(x), train=True,
                              mutable=["batch_stats"])
    got = depth_to_space(packed[..., :8])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=5e-6, rtol=1e-4)
    fa, _ = jax.flatten_util.ravel_pytree(mut_a)
    fb, _ = jax.flatten_util.ravel_pytree(mut_b)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               atol=5e-6, rtol=1e-4)


def test_gather_packed_s2d_matches_full_map_gather():
    """Values AND gradients of the packed half-res gather equal the
    full-resolution map gather it replaces."""
    from pcaccumulation_tpu.models.pillar_encoder import (
        gather_bev_at_pillars,
        gather_packed_s2d_at_pillars,
    )

    b, t, h, w, m = 2, 3, 8, 8, 25
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (b, t, h, w, 2))
    kc = jax.random.split(jax.random.PRNGKey(1), 3)
    coords = jnp.stack([
        jax.random.randint(kc[0], (b, m), 0, t),
        jax.random.randint(kc[1], (b, m), 0, h),
        jax.random.randint(kc[2], (b, m), 0, w),
    ], axis=-1)
    valid = jax.random.uniform(jax.random.PRNGKey(2), (b, m)) < 0.8
    wts = jax.random.normal(jax.random.PRNGKey(3), (b, m, 2))

    def pack(y):
        s = space_to_depth(y.reshape(b * t, h, w, 2))
        s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 120)))
        return s.reshape(b, t, h // 2, w // 2, 128)

    def f_ref(y):
        return jnp.sum(gather_bev_at_pillars(y, coords, valid) * wts)

    def f_new(y):
        return jnp.sum(
            gather_packed_s2d_at_pillars(pack(y), coords, valid, 2) * wts
        )

    np.testing.assert_allclose(float(f_ref(y)), float(f_new(y)), rtol=1e-5)
    ga = jax.grad(f_ref)(y)
    gb = jax.grad(f_new)(y)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=1e-6, rtol=1e-5)


def test_unet_s2d_odd_grid_falls_back():
    """Odd H/W cannot block: the flag silently falls back to plain convs."""
    b = UNet(in_channels=4, depth=2, start_filts=4, s2d_level0=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 12, 4))
    with pytest.raises(Exception):
        # depth-2 UNet needs H,W divisible by 2 for its own pooling; odd
        # input is invalid for the architecture itself
        b.init(jax.random.PRNGKey(3), x)


def test_gather_s2d_3x3_windows_matches_dense_windows():
    """The sparse window gather == 3x3 SAME windows of the full-res map."""
    from pcaccumulation_tpu.ops.s2d import gather_s2d_3x3_windows

    rng = np.random.default_rng(0)
    bt_n, h, w, c = 3, 10, 8, 5
    x = jnp.asarray(rng.normal(size=(bt_n, h, w, c)).astype(np.float32))
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    s = 64
    bt = rng.integers(0, bt_n, s)
    yy = rng.integers(0, h, s)
    xx = rng.integers(0, w, s)
    got = gather_s2d_3x3_windows(
        space_to_depth(x), jnp.asarray(bt, jnp.int32),
        jnp.asarray(yy, jnp.int32), jnp.asarray(xx, jnp.int32),
    )
    for i in range(s):
        ref = xp[bt[i], yy[i]:yy[i] + 3, xx[i]:xx[i] + 3]
        np.testing.assert_array_equal(np.asarray(got[i]), ref)


def test_seghead_sparse_centers_matches_dense_eval():
    """SegHead2D(centers=...) == the dense head map read at the centers."""
    from pcaccumulation_tpu.models.layers import SegHead2D

    rng = np.random.default_rng(1)
    bt_n, h, w, c = 4, 12, 10, 6
    x = jnp.asarray(rng.normal(size=(bt_n, h, w, c)).astype(np.float32))
    head = SegHead2D(8)
    v = head.init(jax.random.PRNGKey(1), x, train=False)
    # push the running stats away from the init (mean 0 / var 1) so the
    # test distinguishes running-stat handling
    v = jax.tree.map(lambda a: a, v)
    bs = {"bn": {"mean": jnp.asarray(rng.normal(size=8), jnp.float32),
                 "var": jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)}}
    v = {"params": v["params"], "batch_stats": bs}
    dense = head.apply(v, x, train=False)
    s = 96
    bt = jnp.asarray(rng.integers(0, bt_n, s), jnp.int32)
    yy = jnp.asarray(rng.integers(0, h, s), jnp.int32)
    xx = jnp.asarray(rng.integers(0, w, s), jnp.int32)
    sparse = head.apply(v, None, train=False, x_s2d=space_to_depth(x),
                        centers=(bt, yy, xx))
    ref = np.asarray(dense)[np.asarray(bt), np.asarray(yy), np.asarray(xx)]
    np.testing.assert_allclose(np.asarray(sparse), ref, atol=2e-5, rtol=1e-4)


def test_seghead_sparse_centers_train_grads_match_dense():
    """TRAIN-mode sparse head == dense head read at the centers: outputs,
    running-stat updates, AND gradients (incl. the BN batch-statistic
    coupling of every input cell to the loss — both paths normalize with
    statistics of the same full conv0 map)."""
    from pcaccumulation_tpu.models.layers import SegHead2D

    rng = np.random.default_rng(2)
    bt_n, h, w, c = 4, 12, 10, 6
    x = jnp.asarray(rng.normal(size=(bt_n, h, w, c)).astype(np.float32))
    head = SegHead2D(8)
    v = head.init(jax.random.PRNGKey(1), x, train=False)
    s = 96
    bt = jnp.asarray(rng.integers(0, bt_n, s), jnp.int32)
    yy = jnp.asarray(rng.integers(0, h, s), jnp.int32)
    xx = jnp.asarray(rng.integers(0, w, s), jnp.int32)
    wgt = jnp.asarray(rng.normal(size=(s, 8)).astype(np.float32))

    def loss_dense(params, xin):
        out, mut = head.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xin, train=True, mutable=["batch_stats"],
        )
        sel = out[bt, yy, xx]
        return jnp.sum(sel * wgt), (sel, mut["batch_stats"])

    def loss_sparse(params, xin):
        out, mut = head.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            None, train=True, x_s2d=space_to_depth(xin),
            centers=(bt, yy, xx), mutable=["batch_stats"],
        )
        return jnp.sum(out * wgt), (out, mut["batch_stats"])

    (ld, (sel_d, bs_d)), gd = jax.value_and_grad(loss_dense, (0, 1),
                                                 has_aux=True)(v["params"], x)
    (ls, (sel_s, bs_s)), gs = jax.value_and_grad(loss_sparse, (0, 1),
                                                 has_aux=True)(v["params"], x)
    np.testing.assert_allclose(np.asarray(sel_s), np.asarray(sel_d),
                               atol=2e-5, rtol=1e-4)
    # running-stat update parity (same full-map conv0 statistics)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        bs_s, bs_d)
    # input gradient (includes the batch-stat VJP over all cells)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               atol=2e-5, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=2e-4),
        gs[0], gd[0])


def test_motionnet_sparse_ego_matches_dense():
    """Full val forward: sparse-eval ego path == dense path (same rngs)."""
    from tests.test_model import tiny_cfg, tiny_batch
    from pcaccumulation_tpu.models import MotionNet

    cfg = tiny_cfg()
    batch = jax.tree.map(jnp.asarray, tiny_batch(cfg))
    model_d = MotionNet({**cfg, "pose_estimation":
                         {**cfg["pose_estimation"], "sparse_eval": False}})
    model_s = MotionNet({**cfg, "pose_estimation":
                         {**cfg["pose_estimation"], "sparse_eval": True}})
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    v = model_d.init(rngs, batch, train=False, mode="val")
    out_d = model_d.apply(v, batch, train=False, mode="val",
                          rngs={"sample": jax.random.key(7)})
    out_s = model_s.apply(v, batch, train=False, mode="val",
                          rngs={"sample": jax.random.key(7)})
    np.testing.assert_allclose(
        np.asarray(out_d["ego_motion_est"]), np.asarray(out_s["ego_motion_est"]),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_d["rec_est"]), np.asarray(out_s["rec_est"]),
        atol=1e-3, rtol=1e-3)
