"""2D UNet backbone on BEV maps — XLA convolutions, channels-last.

Re-implements the reference's models/unet.py:45-233 (DownConv / UpConv /
UNet with transpose-conv upsampling and concat merge, xavier-normal init)
as flax modules on [B, H, W, C] tensors.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.ops.s2d import (
    depth_to_space,
    s2d_expand_kernel,
    s2d_group_max_pool,
    space_to_depth,
)

_XAVIER = nn.initializers.xavier_normal()


def conv3x3(out, name, dtype=None):
    return nn.Conv(out, (3, 3), padding=1, kernel_init=_XAVIER, name=name,
                   dtype=dtype)


class S2DConv3x3(nn.Module):
    """3x3 SAME conv evaluated in space-to-depth layout.

    Parameters are the canonical narrow [3, 3, Cin, Co] kernel + [Co]
    bias — the SAME pytree as ``nn.Conv(Co, (3, 3))`` on the original
    map, so checkpoints and the torch converter are untouched; the exact
    [3, 3, 4Cin, 4Co] s2d kernel is placed at apply time (ops/s2d.py).
    4x the FLOPs at 4x the channel width: 0.58 -> 0.15 ms for C=32 at
    288^2 on v5e (tools/profile_s2d.py)."""

    out_channels: int
    dtype: object = None
    kernel_init: object = _XAVIER
    split_at: int | None = None  # conv over a channel-concat input,
    # WITHOUT materializing the concat: by linearity
    # conv(concat(a, b), k) == conv(a, k[:, :, :split_at])
    #                        + conv(b, k[:, :, split_at:]).
    # The s2d concat interleaves narrow 32-lane channel blocks, which
    # traced ~2x slower than the two 128-lane convs it replaces.

    @nn.compact
    def __call__(self, x_s2d, x2_s2d=None):
        ca = x_s2d.shape[-1] // 4
        cin = ca if self.split_at is None else ca + x2_s2d.shape[-1] // 4
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.dtype is not None:
            x_s2d = x_s2d.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            if x2_s2d is not None:
                x2_s2d = x2_s2d.astype(self.dtype)

        def conv(v, k):
            return jax.lax.conv_general_dilated(
                v, s2d_expand_kernel(k), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.split_at is None:
            y = conv(x_s2d, kernel)
        else:
            y = conv(x_s2d, kernel[:, :, :self.split_at]) + \
                conv(x2_s2d, kernel[:, :, self.split_at:])
        return y + jnp.tile(bias, 4)


class S2DUpsample2x2(nn.Module):
    """2x2-stride-2 transpose conv producing s2d layout: each output
    pixel of a kernel==stride transpose conv depends on exactly one
    input pixel, so in s2d space it is a 1x1 conv (einsum). Parameters
    match ``nn.ConvTranspose(Co, (2, 2), strides=(2, 2))``."""

    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # x [B, H, W, Cin] (NOT s2d) -> [B, H, W, 4Co]
        cin = x.shape[-1]
        kernel = self.param("kernel", _XAVIER, (2, 2, cin, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        b, h, w, _ = x.shape
        # lax.conv_transpose applies the kernel FLIPPED: for kernel==stride
        # y[2i+a, 2j+b, o] = sum_c x[i, j, c] k[1-a, 1-b, c, o] (probed
        # against nn.ConvTranspose with a delta input)
        y = jnp.einsum("bhwc,xyco->bhwxyo", x, kernel[::-1, ::-1])
        return y.reshape(b, h, w, 4 * self.out_channels) + jnp.tile(bias, 4)


class DownConv(nn.Module):
    """Two 3x3 convs (+ReLU) and an optional 2x2 max pool (unet.py:45-71)."""

    out_channels: int
    pooling: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv3x3(self.out_channels, "conv1", self.dtype)(x))
        x = nn.relu(conv3x3(self.out_channels, "conv2", self.dtype)(x))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class DownConvS2D(nn.Module):
    """DownConv evaluated in s2d space: input/skip are s2d tensors, the
    pooled output is the ORIGINAL-layout half-resolution map (the 2x2/2
    max-pool is a per-channel max over sub-positions, so pooling lands
    exactly on the next level's input — no depth-to-space needed).
    Parameter tree identical to DownConv."""

    out_channels: int
    pooling: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x_s2d):
        x = nn.relu(S2DConv3x3(self.out_channels, self.dtype, name="conv1")(x_s2d))
        x = nn.relu(S2DConv3x3(self.out_channels, self.dtype, name="conv2")(x))
        before_pool = x  # s2d layout
        pooled = s2d_group_max_pool(x, self.out_channels) if self.pooling else x
        return pooled, before_pool


class UpConvS2D(nn.Module):
    """UpConv whose skip arrives in s2d layout and whose output stays in
    s2d layout. The 2x2/2 transpose conv becomes a 1x1 conv into s2d
    space; the skip concat interleaves per-sub-position channel blocks.
    Parameter tree identical to UpConv."""

    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, from_down_s2d, from_up):
        co = self.out_channels
        up = S2DUpsample2x2(co, self.dtype, name="upconv")(from_up)
        x = nn.relu(S2DConv3x3(co, self.dtype, split_at=co,
                               name="conv1")(up, from_down_s2d))
        x = nn.relu(S2DConv3x3(co, self.dtype, name="conv2")(x))
        return x


class UpConv(nn.Module):
    """2x2 transpose-conv upsample, concat skip, two 3x3 convs
    (unet.py:74-113)."""

    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, from_down, from_up):
        up = nn.ConvTranspose(
            self.out_channels, (2, 2), strides=(2, 2), kernel_init=_XAVIER,
            name="upconv", dtype=self.dtype,
        )(from_up)
        x = nn.relu(conv3x3(self.out_channels, "conv1", self.dtype)(
            jnp.concatenate([up, from_down], axis=-1)
        ))
        x = nn.relu(conv3x3(self.out_channels, "conv2", self.dtype)(x))
        return x


class UNet(nn.Module):
    """Encoder/decoder with `depth` levels, start_filts doubling per level,
    final 3x3 conv back to in_channels (unet.py:116-233)."""

    in_channels: int = 32
    depth: int = 5
    start_filts: int = 32
    dtype: object = None
    keep_compute_dtype: bool = False  # every MotionNet consumer (heads,
    # fold/warp, per-point gathers) immediately re-casts to the compute
    # dtype; the f32 round trip materialized a 229 MB canvas at nuScenes
    # scale and its convert alone traced 1.75 ms
    s2d_level0: bool = False  # run level 0 (full-resolution, narrowest
    # channels) in space-to-depth layout: same math, same params, but the
    # 3x3 convs go 4x wider and fill the MXU (tools/profile_s2d.py:
    # 0.58 -> 0.15 ms per conv at C=32, 288^2, bf16)
    also_return_s2d: bool = False  # additionally return the pre-d2s
    # conv_final output (None when the s2d path is inactive) so s2d-aware
    # consumers (S2DSegHead2D) skip the d2s->s2d round trip

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        s2d = (self.s2d_level0 and self.depth > 1
               and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2 ** i)
            pooling = i < self.depth - 1
            if s2d and i == 0:
                x, before = DownConvS2D(outs, pooling, self.dtype,
                                        name="down0")(space_to_depth(x))
            else:
                x, before = DownConv(outs, pooling, self.dtype,
                                     name=f"down{i}")(x)
            encoder_outs.append(before)
        for i in range(self.depth - 1):
            outs = outs // 2
            if s2d and i == self.depth - 2:
                # last up level: the skip (down0's pre-pool map) is s2d
                x = UpConvS2D(outs, self.dtype, name=f"up{i}")(
                    encoder_outs[0], x
                )
            else:
                x = UpConv(outs, self.dtype, name=f"up{i}")(
                    encoder_outs[-(i + 2)], x
                )
        out_s2d = None
        if s2d:
            out_s2d = S2DConv3x3(self.in_channels, self.dtype,
                                 name="conv_final")(x)
            out = depth_to_space(out_s2d)
        else:
            out = conv3x3(self.in_channels, "conv_final", self.dtype)(x)
        if not self.keep_compute_dtype:
            out = out.astype(in_dtype)
            out_s2d = None if out_s2d is None else out_s2d.astype(in_dtype)
        if self.also_return_s2d:
            return out, out_s2d
        return out


class UNetCustomWidths(nn.Module):
    """UNet variant with an explicit per-level width list (used by the STPN:
    stpn.py:24-43 builds widths [64, 64, 128, 128, 256] down and
    [128, 128, 64, 64] up via max(64, n_filters))."""

    down_widths: Sequence[int]
    up_widths: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        encoder_outs = []
        for i, w in enumerate(self.down_widths):
            pooling = i < len(self.down_widths) - 1
            x, before = DownConv(w, pooling, self.dtype, name=f"down{i}")(x)
            encoder_outs.append(before)
        for i, w in enumerate(self.up_widths):
            x = UpConv(w, self.dtype, name=f"up{i}")(encoder_outs[-(i + 2)], x)
        return x
