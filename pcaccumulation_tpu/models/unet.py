"""2D UNet backbone on BEV maps — XLA convolutions, channels-last.

Re-implements the reference's models/unet.py:45-233 (DownConv / UpConv /
UNet with transpose-conv upsampling and concat merge, xavier-normal init)
as flax modules on [B, H, W, C] tensors.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_normal()


def conv3x3(out, name, dtype=None):
    return nn.Conv(out, (3, 3), padding=1, kernel_init=_XAVIER, name=name,
                   dtype=dtype)


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

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2 ** i)
            pooling = i < self.depth - 1
            x, before = DownConv(outs, pooling, self.dtype, name=f"down{i}")(x)
            encoder_outs.append(before)
        for i in range(self.depth - 1):
            outs = outs // 2
            x = UpConv(outs, self.dtype, name=f"up{i}")(encoder_outs[-(i + 2)], x)
        out = conv3x3(self.in_channels, "conv_final", self.dtype)(x)
        return out if self.keep_compute_dtype else out.astype(in_dtype)


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
