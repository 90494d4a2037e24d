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


class STPN(nn.Module):
    feat_dim: int = 32
    offset_clamp: float = 20.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, points, point_mask, pc_range_min: float,
                 train: bool = False):
        """
        Args:
          x:      [B, T, H, W, C] warped BEV features.
          points: [B, N, 3] transformed (anchor-frame) points. The caller
            may pass a pre-gathered FG subset (MotionNet does: only
            foreground points are ever consumed downstream, so decoding
            the subset cuts the ungrid + MLP + head work N/S-fold).
          point_mask: [B, N] bool — which rows are real (BN statistics).
          pc_range_min: scalar, min x/y coordinate of the grid.
        Returns:
          classes [B, N, 2], offset [B, N, 2], mos feature map [B, H, W, 64]
        """
        # temporal aggregation (stpn.py:13-22, 79-80)
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.feat_dim, (3, 3, 3), padding=1, name=f"init_conv{i}",
                        dtype=self.dtype)(x)
            )
        x = jnp.max(x, axis=1)  # [B, H, W, C]

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
