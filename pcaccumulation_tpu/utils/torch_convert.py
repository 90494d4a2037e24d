"""Reference PyTorch checkpoint -> JAX parameter pytree converter.

Maps the reference MotionNet state_dict (libs/trainer.py:65-83 layout) onto
this package's flax parameter / batch-stats trees so shipped checkpoints
reproduce their metrics (SURVEY.md §5.4). Handles the layout differences:

  torch Linear  [out, in]          -> kernel [in, out]
  torch Conv2d  [out, in, H, W]    -> kernel [H, W, in, out]
  torch Conv3d  [out, in, T, H, W] -> kernel [T, H, W, in, out]
  torch ConvTranspose2d [in, out, H, W] -> flax ConvTranspose kernel
        [H, W, in, out] with spatially flipped taps (flax's conv_transpose
        is a fractionally-strided convolution, torch's is the conv adjoint;
        for the 2x2/stride-2 upconvs the flip is a no-op only if the kernel
        is symmetric, so we flip explicitly)
  torch BatchNorm weight/bias/running_mean/running_var
        -> params {scale, bias} + batch_stats {mean, var}

Loading does not require torch: `.pth` files are read with
torch.load(map_location='cpu') when torch is importable, else via pickle.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x)


def linear(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def conv2d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # [O, I, H, W]
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _t(sd[f"{prefix}.bias"])}


def conv3d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # [O, I, T, H, W]
    return {"kernel": w.transpose(2, 3, 4, 1, 0), "bias": _t(sd[f"{prefix}.bias"])}


def conv_transpose2d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # [I, O, H, W]
    w = w[:, :, ::-1, ::-1].copy()  # adjoint vs fractionally-strided conv
    return {"kernel": w.transpose(2, 3, 0, 1), "bias": _t(sd[f"{prefix}.bias"])}


def bn_params(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def bn_stats(sd, prefix):
    return {"mean": _t(sd[f"{prefix}.running_mean"]),
            "var": _t(sd[f"{prefix}.running_var"])}


def mlp(sd, prefix, torch_indices):
    """nn.Sequential of Linear(+ReLU) at given torch indices -> MLP fc{i}."""
    return {f"fc{i}": linear(sd, f"{prefix}.{ti}") for i, ti in enumerate(torch_indices)}


def resnet_block(sd, prefix):
    out = {"fc_0": linear(sd, f"{prefix}.fc_0"),
           "fc_1": linear(sd, f"{prefix}.fc_1")}
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = {"kernel": _t(sd[f"{prefix}.shortcut.weight"]).T}
    return out


def seg_head_2d(sd, prefix):
    params = {"conv0": conv2d(sd, f"{prefix}.seg_head.0"),
              "bn": bn_params(sd, f"{prefix}.seg_head.1"),
              "conv1": conv2d(sd, f"{prefix}.seg_head.3")}
    stats = {"bn": bn_stats(sd, f"{prefix}.seg_head.1")}
    return params, stats


def seg_head_1d(sd, prefix):
    params = {"fc0": linear(sd, f"{prefix}.seg_head.0"),
              "bn": bn_params(sd, f"{prefix}.seg_head.1"),
              "fc1": linear(sd, f"{prefix}.seg_head.3")}
    stats = {"bn": bn_stats(sd, f"{prefix}.seg_head.1")}
    return params, stats


def down_conv(sd, prefix):
    return {"conv1": conv2d(sd, f"{prefix}.conv1"),
            "conv2": conv2d(sd, f"{prefix}.conv2")}


def up_conv(sd, prefix):
    return {"upconv": conv_transpose2d(sd, f"{prefix}.upconv"),
            "conv1": conv2d(sd, f"{prefix}.conv1"),
            "conv2": conv2d(sd, f"{prefix}.conv2")}


def unet(sd, prefix, depth=5):
    out = {}
    for i in range(depth):
        out[f"down{i}"] = down_conv(sd, f"{prefix}.down_convs.{i}")
    for i in range(depth - 1):
        out[f"up{i}"] = up_conv(sd, f"{prefix}.up_convs.{i}")
    out["conv_final"] = conv2d(sd, f"{prefix}.conv_final")
    return out


def convert_state_dict(sd: dict, pillar_depth: int = 3,
                       unet_depth: int = 5) -> tuple[dict, dict]:
    """Full reference MotionNet state_dict -> (params, batch_stats)."""
    sd = {k: _t(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # pillar encoder (models/pillar_encoder.py:59-95)
    pe = {"fc_pos": linear(sd, "pillar_encoder.fc_pos"),
          "fc_c": linear(sd, "pillar_encoder.fc_c")}
    for i in range(pillar_depth):
        pe[f"block{i}"] = resnet_block(sd, f"pillar_encoder.blocks.{i}")
    params["pillar_encoder"] = pe

    # backbone UNet
    params["unet"] = unet(sd, "unet", depth=unet_depth)

    # heads
    params["semseg_head"], stats["semseg_head"] = seg_head_2d(sd, "semseg_head")
    params["ego_feats_head"], stats["ego_feats_head"] = seg_head_2d(sd, "ego_feats_head")

    params["ego_motion_head"] = {
        "alpha": _t(sd["ego_motion_head.alpha"]),
        "beta": _t(sd["ego_motion_head.beta"]),
    }

    # STPN (models/stpn.py:13-59): init_conv Sequential has convs at 0,2,4,6
    mh: dict = {}
    mh_stats: dict = {}
    for i, ti in enumerate((0, 2, 4, 6)):
        mh[f"init_conv{i}"] = conv3d(sd, f"motionhead.init_conv.{ti}")
    stpn_unet = {}
    for i in range(5):
        stpn_unet[f"down{i}"] = down_conv(sd, f"motionhead.down_convs.{i}")
    for i in range(4):
        stpn_unet[f"up{i}"] = up_conv(sd, f"motionhead.up_convs.{i}")
    mh["unet"] = stpn_unet
    mh["positional_encoding"] = mlp(sd, "motionhead.positional_encoding", (0, 2))
    mh["final_proj"] = linear(sd, "motionhead.final_proj.0")
    mh["mos_seg"], mh_stats["mos_seg"] = seg_head_1d(sd, "motionhead.mos_seg")
    mh["offset_head"], mh_stats["offset_head"] = seg_head_1d(sd, "motionhead.offset_head")
    params["motionhead"] = mh
    stats["motionhead"] = mh_stats

    # TPointNet (models/tpointnet.py:173-205)
    al = {
        "geo_embed": mlp(sd, "reconstructor.alignment.geo_embed", (0, 2, 4)),
        "motion_embed": mlp(sd, "reconstructor.alignment.motion_embed", (0, 2, 4)),
        "pos_embed": mlp(sd, "reconstructor.alignment.pos_embed", (0, 2, 4)),
        "reg_fc0": linear(sd, "reconstructor.alignment.regressor.0"),
        "reg_bn0": bn_params(sd, "reconstructor.alignment.regressor.1"),
        "reg_fc1": linear(sd, "reconstructor.alignment.regressor.3"),
        "reg_bn1": bn_params(sd, "reconstructor.alignment.regressor.4"),
        "reg_fc2": linear(sd, "reconstructor.alignment.regressor.6"),
    }
    al_stats = {
        "reg_bn0": bn_stats(sd, "reconstructor.alignment.regressor.1"),
        "reg_bn1": bn_stats(sd, "reconstructor.alignment.regressor.4"),
    }
    params["reconstructor"] = {"alignment": al}
    stats["reconstructor"] = {"alignment": al_stats}

    return params, stats


def load_torch_checkpoint(path: str):
    """Read a reference .pth and return (params, batch_stats, meta)."""
    try:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:  # pragma: no cover
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
    sd = state["state_dict"] if "state_dict" in state else state
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, stats = convert_state_dict(sd)
    meta = {k: state[k] for k in ("epoch", "best_loss", "best_metric") if k in state}
    return params, stats, meta
