"""Shared flax building blocks.

Channels-last (NHWC / NTHWC) throughout — the layout XLA:TPU tiles onto the
MXU without transposes. Parity notes cite the reference modules each block
re-implements.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """Linear stack with ReLU between layers (optionally after the last).

    `dtype` is the flax compute dtype: params stay f32, activations are cast
    (bf16 runs one MXU pass instead of f32's three bf16 passes)."""

    features: Sequence[int]
    final_act: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}", dtype=self.dtype)(x)
            if i + 1 < len(self.features) or self.final_act:
                x = nn.relu(x)
        return x


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block (pillar_encoder.py:13-55): pre-activation
    two-layer MLP with zero-initialised second layer and a bias-free linear
    shortcut when the width changes."""

    size_out: int
    size_h: int | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)
        net = nn.Dense(size_h, name="fc_0", dtype=self.dtype)(nn.relu(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros,
                      name="fc_1", dtype=self.dtype)(nn.relu(net))
        if size_in == self.size_out:
            shortcut = x
        else:
            shortcut = nn.Dense(self.size_out, use_bias=False, name="shortcut",
                                dtype=self.dtype)(x)
        return shortcut + dx


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a flat [N, C] point set where only masked rows count.

    The reference applies torch BatchNorm1d to dynamically-selected point
    subsets (unet.py:235-256 SegHead1D, tpointnet.py:197-205 regressor);
    with static shapes the selection becomes a mask on the statistics.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            if mask is None:
                mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
                var = jnp.var(x, axis=tuple(range(x.ndim - 1)))
            else:
                m = mask.astype(x.dtype).reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / count
                var = (
                    jnp.sum((x - mean) ** 2 * m, axis=tuple(range(x.ndim - 1))) / count
                )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class SegHead1D(nn.Module):
    """Linear -> masked BN -> ReLU -> Linear (unet.py:235-256)."""

    out_channel: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        mid = max(x.shape[-1], self.out_channel)
        x = nn.Dense(mid, name="fc0")(x)
        x = MaskedBatchNorm(name="bn")(x, mask=mask, train=train)
        x = nn.relu(x)
        return nn.Dense(self.out_channel, name="fc1")(x)


class Conv3x3(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.xavier_normal(), name="conv",
        )(x)


class BlockDiagConv(nn.Module):
    """3x3 conv applied independently to each of `n_blocks` channel blocks.

    Parameters are a SINGLE per-block kernel [3, 3, Cin, features] + bias
    [features] (the same pytree as ``nn.Conv(features, (3, 3))`` on the
    unfolded per-frame input), assembled into a block-diagonal
    [3, 3, n_blocks*Cin, n_blocks*features] kernel at call time. On a
    folded [B, H, W, T*C] BEV canvas this replaces a [B*T, H, W, C]
    per-frame conv: the zero off-diagonal blocks waste (T-1)/T of the
    FLOPs, but T*C-wide channels fill the 128-lane MXU that a C=32 conv
    cannot (same trade measured 5x for STPN's banded conv3d).
    """

    features: int
    n_blocks: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # x [B, H, W, n_blocks*Cin]
        nb = self.n_blocks
        cin = x.shape[-1] // nb
        co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, co)
        )
        bias = self.param("bias", nn.initializers.zeros, (co,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        big = jnp.zeros((3, 3, nb * cin, nb * co), kernel.dtype)
        for i in range(nb):
            big = big.at[:, :, i * cin:(i + 1) * cin, i * co:(i + 1) * co].set(
                kernel
            )
        out = jax.lax.conv_general_dilated(
            x, big, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.tile(bias, nb)


class FoldedSegHead2D(nn.Module):
    """SegHead2D evaluated on a FOLDED [B, H, W, T*C] canvas.

    Exactly the same parameter pytree as SegHead2D (conv0 / bn / conv1, so
    the torch-checkpoint converter is untouched) and the same math: the
    convs are block-diagonal per frame, and BatchNorm runs on the
    [B, H, W, T, mid] view, whose (B,H,W,T) statistics equal SegHead2D's
    (B*T,H,W) statistics on the unfolded input. Output [B, H, W, T*out].
    """

    out_channel: int
    n_frames: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.n_frames
        c = x.shape[-1] // t
        mid = max(c, self.out_channel)
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = BlockDiagConv(mid, t, dtype=self.dtype, name="conv0")(x)
        b, h, w, _ = x.shape
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn", dtype=self.dtype)(
            x.reshape(b, h, w, t, mid)
        )
        x = nn.relu(x.reshape(b, h, w, t * mid))
        x = BlockDiagConv(self.out_channel, t, dtype=self.dtype,
                          name="conv1")(x)
        return x.astype(in_dtype)


class NarrowConv3x3(nn.Module):
    """3x3 conv for outputs narrower than the 128-lane width.

    Same param pytree as ``nn.Conv(features, (3, 3))``. The kernel is
    zero-padded to `pad_to` output channels at call time and the result
    sliced back: on v5e a bf16 [4,288,288,32]->2 conv measured 0.93 ms
    while the 128-padded form measured 0.41 ms — narrow outputs hit a
    pathological emitter tiling (the HBM tensor is lane-padded to 128
    either way, so the pad adds no real traffic)."""

    features: int
    pad_to: int = 128
    dtype: object = None
    keep_padded: bool = False  # return [..., pad_to] (extra channels = 0):
    # slicing here lets XLA's algebraic simplifier rewrite
    # slice(conv(pad(k))) back to the narrow conv, undoing the trick

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        kp = jnp.pad(kernel,
                     ((0, 0), (0, 0), (0, 0), (0, self.pad_to - self.features)))
        bp = jnp.pad(bias, (0, self.pad_to - self.features))
        out = jax.lax.conv_general_dilated(
            x, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bp
        return out if self.keep_padded else out[..., :self.features]


class S2DBatchNorm(nn.Module):
    """BatchNorm over a space-to-depth tensor, per ORIGINAL channel.

    The s2d layout holds each original channel 4x (one copy per 2x2
    sub-position); correct BN statistics reduce over (N, H, W, sub-pos).
    Param / batch_stats trees are identical to ``nn.BatchNorm`` on the
    original map ([C] scale/bias/mean/var), so checkpoints are untouched.
    Eval mode never reshapes: the running stats are tiled 4x and fuse
    into the surrounding elementwise ops."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None

    @nn.compact
    def __call__(self, x_s2d, train: bool = False):
        c = x_s2d.shape[-1] // 4
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xf = x_s2d.astype(jnp.float32)
            n = xf.size // (4 * c)
            # reduce (N, H, W) -> [4C], then fold the 4 sub-position
            # blocks -> [C]: avoids materializing a [..., 4, C] view
            s1 = jnp.sum(xf, axis=tuple(range(xf.ndim - 1)))
            s2 = jnp.sum(jnp.square(xf), axis=tuple(range(xf.ndim - 1)))
            mean = s1.reshape(4, c).sum(0) / (4 * n)
            var = s2.reshape(4, c).sum(0) / (4 * n) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        dt = self.dtype or x_s2d.dtype
        mul = (scale.astype(jnp.float32)
               / jnp.sqrt(var + self.epsilon)).astype(dt)
        add = (bias.astype(jnp.float32)
               - mean * scale.astype(jnp.float32)
               / jnp.sqrt(var + self.epsilon)).astype(dt)
        return x_s2d.astype(dt) * jnp.tile(mul, 4) + jnp.tile(add, 4)


class S2DPackedNarrowConv3x3(nn.Module):
    """NarrowConv3x3 evaluated in s2d layout with a PACKED output: the
    four sub-position blocks of `features` channels are packed into the
    leading 4*features channels of one `pad_to`-lane map, i.e. output
    channel block*features + o holds sub-position `block`'s channel `o`.
    ``depth_to_space(out[..., :4*features])`` recovers the narrow map.
    Unlike per-block padding this keeps the conv at `pad_to` output
    lanes — the SAME FLOPs as the plain padded NarrowConv3x3 but at 4x
    the channel width and 1/4 the spatial size (0.67 -> ~0.15 ms for the
    2-ch FB head at 288^2-equivalent). Param tree identical to
    NarrowConv3x3."""

    features: int
    pad_to: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, x_s2d):
        from pcaccumulation_tpu.ops.s2d import s2d_expand_kernel

        cin = x_s2d.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x_s2d, kernel, bias = nn.dtypes.promote_dtype(x_s2d, kernel, bias,
                                                      dtype=self.dtype)
        ke = s2d_expand_kernel(kernel)  # [3, 3, 4cin, 4*features]
        kp = jnp.pad(ke, ((0, 0), (0, 0), (0, 0),
                          (0, self.pad_to - 4 * self.features)))
        bp = jnp.pad(jnp.tile(bias, 4), (0, self.pad_to - 4 * self.features))
        out = jax.lax.conv_general_dilated(
            x_s2d, kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bp


class S2DSegHead2D(nn.Module):
    """The narrow (FB) SegHead2D evaluated on the s2d UNet output
    (models/unet.py s2d_level0): conv0/bn/relu run 4x wider in s2d
    layout and conv1 packs its four sub-position blocks into one
    128-lane HALF-RESOLUTION map — no depth-to-space on the hot path;
    the pillar gather reads the packed map directly
    (pillar_encoder.gather_packed_s2d_at_pillars) and
    ``depth_to_space(out[..., :4*out_channel])`` reconstructs the
    full-resolution logit map for val-mode views. Same parameter pytree
    as SegHead2D. Reference head: /root/reference/models/unet.py:259-277.

    The wide (ego-feature, mid=64) head stays on the plain SegHead2D:
    at 256 s2d channels the 4x FLOPs only break even
    (tools/profile_s2d.py C=64 row), so s2d is a loss there."""

    out_channel: int
    dtype: object = None
    keep_compute_dtype: bool = False
    pad_narrow_out: bool = True  # accepted for SegHead2D signature
    # compatibility; the packed output is always 128-lane

    @nn.compact
    def __call__(self, x_s2d, train: bool = False):
        from pcaccumulation_tpu.models.unet import S2DConv3x3

        assert self.out_channel < 8, (
            "S2DSegHead2D is the narrow-head specialization; wide heads "
            "measured no s2d win (tools/profile_s2d.py)"
        )
        in_dtype = x_s2d.dtype
        if self.dtype is not None:
            x_s2d = x_s2d.astype(self.dtype)
        mid = max(x_s2d.shape[-1] // 4, self.out_channel)
        x = S2DConv3x3(mid, dtype=self.dtype, name="conv0",
                       kernel_init=nn.initializers.lecun_normal())(x_s2d)
        x = S2DBatchNorm(momentum=0.9, name="bn", dtype=self.dtype)(
            x, train=train
        )
        x = nn.relu(x)
        out = S2DPackedNarrowConv3x3(self.out_channel, name="conv1",
                                     dtype=self.dtype)(x)
        return out if self.keep_compute_dtype else out.astype(in_dtype)


class FlatConv3x3(nn.Module):
    """A 3x3 conv evaluated on pre-gathered [S, 3, 3, Cin] windows as one
    [S, 9*Cin] x [9*Cin, Cout] matmul. Parameter pytree identical to
    ``nn.Conv(Cout, (3, 3))`` (kernel [3, 3, Cin, Cout] + bias), so the
    sparse and dense head paths share checkpoints."""

    out_channel: int
    dtype: object = None

    @nn.compact
    def __call__(self, win):
        s, kh, kw, cin = win.shape
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (kh, kw, cin, self.out_channel))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channel,))
        win, kernel, bias = nn.dtypes.promote_dtype(
            win, kernel, bias, dtype=self.dtype
        )
        out = win.reshape(s, kh * kw * cin) @ kernel.reshape(
            kh * kw * cin, self.out_channel
        )
        return out + bias


class SegHead2D(nn.Module):
    """Conv3x3 -> BN -> ReLU -> Conv3x3 over [..., H, W, C] maps
    (unet.py:259-277).

    `keep_compute_dtype=True` returns the compute-dtype output instead of
    casting back to the input dtype — callers that gather a small subset
    (e.g. at pillars) convert after the gather, saving a full-canvas
    f32 materialization."""

    out_channel: int
    dtype: object = None
    keep_compute_dtype: bool = False
    pad_narrow_out: bool = False  # out_channel < 8: return [..., 128] with
    # zero-padded extra channels; the caller slices AFTER any gather

    @nn.compact
    def __call__(self, x, train: bool = False, x_s2d=None, centers=None):
        if centers is not None:
            # SPARSE head: the graph only reads this head's map at the
            # T*n_kpts sampled pillar cells (egomotion.py top_k), so
            # conv0/bn/relu run dense but 4x-wide in s2d layout (the fast
            # conv shape for 32-in channels) and conv1 is evaluated ONLY
            # at the sampled cells: 3x3 windows gathered from the s2d map
            # + one [S, 9*mid] x [9*mid, out] matmul. Identical parameter
            # pytree and math as the dense path. In train mode this is
            # gradient-exact too: BN's batch statistics (and their VJP
            # coupling of every cell to the loss) come from the SAME
            # full conv0 map as the dense path — only conv1 and its VJP
            # shrink from full-map to the sampled windows (~2.3 ms/step
            # traced at bench shapes). centers = (bt, y, x) flat int32.
            from pcaccumulation_tpu.models.unet import S2DConv3x3
            from pcaccumulation_tpu.ops.s2d import gather_s2d_3x3_windows

            h = x_s2d
            if self.dtype is not None:
                h = h.astype(self.dtype)
            mid = max(h.shape[-1] // 4, self.out_channel)
            h = S2DConv3x3(mid, dtype=self.dtype, name="conv0",
                           kernel_init=nn.linear.default_kernel_init)(h)
            h = S2DBatchNorm(momentum=0.9, name="bn", dtype=self.dtype)(
                h, train=train
            )
            h = nn.relu(h)
            win = gather_s2d_3x3_windows(h, *centers)  # [S, 3, 3, mid]
            return FlatConv3x3(self.out_channel, name="conv1",
                               dtype=self.dtype)(win)

        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        mid = max(x.shape[-1], self.out_channel)
        x = nn.Conv(mid, (3, 3), padding=1, name="conv0", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn",
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.out_channel < 8 and self.pad_narrow_out:
            out = NarrowConv3x3(self.out_channel, name="conv1",
                                dtype=self.dtype, keep_padded=True)(x)
        else:
            out = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv1",
                          dtype=self.dtype)(x)
        return out if self.keep_compute_dtype else out.astype(in_dtype)
