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


def test_unet_s2d_odd_grid_falls_back():
    """Odd H/W cannot block: the flag silently falls back to plain convs."""
    b = UNet(in_channels=4, depth=2, start_filts=4, s2d_level0=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 12, 4))
    with pytest.raises(Exception):
        # depth-2 UNet needs H,W divisible by 2 for its own pooling; odd
        # input is invalid for the architecture itself
        b.init(jax.random.PRNGKey(3), x)
