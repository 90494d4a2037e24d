"""STPN: spatio-temporal pyramid for motion segmentation + offset voting.

Re-implements the reference's models/stpn.py:7-105: four 3D convolutions
over the warped BEV sequence, temporal max pooling, a small UNet
(widths max(64, [32,64,128,128,256])), per-point bilinear feature lookup
with positional encoding, and MOS / offset heads with the NaN/clamp guard.

Layout: [B, T, H, W, C]; 3D convs run over (T, H, W) channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcaccumulation_tpu.models.layers import MLP, SegHead1D
from pcaccumulation_tpu.models.unet import UNetCustomWidths
from pcaccumulation_tpu.ops.bilinear import ungrid


class TemporalBandedConv(nn.Module):
    """3x3x3 Conv3d over [B, T, H, W, C], computed in a T-folded layout.

    Mathematically identical to ``nn.Conv(features, (3, 3, 3))`` — the
    parameters are the SAME pytree (kernel [3, 3, 3, C, C] + bias [C], so
    the torch-checkpoint converter is untouched) — but the input arrives
    as [B, H, W, T*C] and the op runs as ONE 2-D convolution with a
    block-banded [3, 3, T*C, T*C] kernel assembled at call time: the
    t-axis of a 3x3x3 kernel only couples |dt| <= 1, and folding T into
    channels fills the 128-lane MXU that a 32-channel Conv3d cannot
    (measured 4.12 -> 0.78 ms for STPN's 4-layer chain at T=4, 288^2 bf16
    on v5e; the banded kernel's zero blocks waste 1/3 of the FLOPs but
    MXU utilisation rises ~5x). Replaces the reference's Conv3d stack
    (stpn.py:13-22) compute-for-compute.
    """

    features: int
    n_frames: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # x [B, H, W, T*C]
        c, t = self.features, self.n_frames
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, c, c)
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        big = jnp.zeros((3, 3, t * c, t * c), kernel.dtype)
        for to in range(t):
            for dt in (-1, 0, 1):
                ti = to + dt
                if 0 <= ti < t:
                    # cross-correlation: out[to] += kernel[dt+1] * in[to+dt]
                    big = big.at[
                        :, :, ti * c:(ti + 1) * c, to * c:(to + 1) * c
                    ].set(kernel[dt + 1])
        out = jax.lax.conv_general_dilated(
            x, big, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.tile(bias, t)


class STPN(nn.Module):
    """n_band_layers: how many of the 4 temporal conv layers run BEFORE
    the temporal max as full 3x3x3 banded convs. 4 = reference parity
    (stpn.py:13-22: all four 3D convs, then max). k < 4 is an OPT-IN
    speed/accuracy trade with no reference counterpart: layers k..3 run
    AFTER the max as plain 3x3 2-D convs on the fused [B, H, W, C] map,
    cutting each moved layer's FLOPs (T*C)^2 -> C^2 (121x at T=11) at
    the cost of shallower temporal mixing — different parameters, so no
    checkpoint parity. Measured (tools/PROFILE_r11.md): -6.7% val step
    at T=11, train unchanged; the 5-seed A/B shows k=2 costs a
    CONSISTENT ~0.03 fb_iou (same sign 5/5 seeds, paired p~0.025;
    ego/mos/inst metrics equivalent within noise) — an
    accuracy/throughput trade, not a free lunch."""

    feat_dim: int = 32
    n_frames: int = 5
    offset_clamp: float = 20.0
    dtype: object = None
    n_band_layers: int = 4

    @nn.compact
    def __call__(self, x, points, point_mask, pc_range_min: float,
                 train: bool = False):
        """
        Args:
          x:      [B, H, W, T*C] warped BEV features, FOLDED t-minor (the
            canonical post-UNet layout: T*C = 128 = the TPU lane width).
          points: [B, N, 3] transformed (anchor-frame) points. The caller
            may pass a pre-gathered FG subset (MotionNet does: only
            foreground points are ever consumed downstream, so decoding
            the subset cuts the ungrid + MLP + head work N/S-fold).
          point_mask: [B, N] bool — which rows are real (BN statistics).
          pc_range_min: scalar, min x/y coordinate of the grid.
        Returns:
          classes [B, N, 2], offset [B, N, 2], mos feature map [B, H, W, 64]
        """
        # temporal aggregation (stpn.py:13-22, 79-80); the Conv3d stack runs
        # T-folded as banded 2-D convs (see TemporalBandedConv)
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        b_, h_, w_, _ = x.shape
        t_ = self.n_frames
        # NOTE (PROFILE_r08): in TRAIN graphs at T*C > 128 XLA materialises
        # each conv's im2col window stack ([H, W, T*C, 3] shifted relu
        # copies) as a residual shared by the forward conv and the backward
        # wgrad (~4.3 ms traced at T=11). Per-layer nn.remat to force
        # recomputation was measured NEUTRAL (62.66 vs 62.53 ms at B=1,
        # 256.3 vs 256.9 ms at B=4) — the windows cost the same wherever
        # they are built — so the stack stays untransformed.
        k = self.n_band_layers
        assert 1 <= k <= 4, k
        for i in range(k):
            x = nn.relu(
                TemporalBandedConv(self.feat_dim, t_, dtype=self.dtype,
                                   name=f"init_conv{i}")(x)
            )
        x = x.reshape(b_, h_, w_, t_, self.feat_dim).max(axis=3)  # [B, H, W, C]
        for i in range(k, 4):
            # the moved layers (opt-in, n_band_layers < 4): same count of
            # 3x3 conv+relu stages, but on the POST-max fused map
            x = nn.relu(nn.Conv(
                self.feat_dim, (3, 3), dtype=self.dtype,
                name=f"post_conv{i}")(x))

        # small UNet (stpn.py:24-43: widths max(64, [32,64,128,128,256]))
        n_filters = [32, 64, 128, 128, 256]
        down = [max(64, w) for w in n_filters]
        up = [max(64, w) for w in n_filters[-2::-1]]
        x = UNetCustomWidths(down, up, self.dtype, name="unet")(x)
        x = x.astype(in_dtype)  # [B, H, W, 64]

        # per-point decoding (stpn.py:91-99)
        ungridded = jax.vmap(
            lambda fm, pts: ungrid(fm, pts[:, :2], pc_range_min, "border")
        )(x, points)  # [B, N, 64]

        pos = MLP([32, 64], final_act=True, name="positional_encoding")(
            points / abs(pc_range_min)
        )
        enc = jnp.concatenate([pos, ungridded], axis=-1)  # [B, N, 128]
        enc = nn.relu(nn.Dense(128, name="final_proj")(enc))

        flat = enc.reshape(-1, enc.shape[-1])
        mask = point_mask.reshape(-1)
        classes = SegHead1D(2, name="mos_seg")(flat, mask=mask, train=train)
        offset = SegHead1D(2, name="offset_head")(flat, mask=mask, train=train)

        # safe-guard (stpn.py:61-65)
        offset = jnp.where(jnp.isfinite(offset), offset, 0.0)
        offset = jnp.clip(offset, -self.offset_clamp, self.offset_clamp)

        b, n = points.shape[:2]
        return classes.reshape(b, n, 2), offset.reshape(b, n, 2), x
