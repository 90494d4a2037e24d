"""Numerical parity: converted torch weights reproduce reference module
outputs (the contract behind checkpoint conversion, SURVEY.md §5.4)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference")  # reference torch modules (UNet etc.)

from pcaccumulation_tpu.utils import torch_convert as tc


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def test_unet_parity(rng):
    from models.unet import UNet as TorchUNet

    torch.manual_seed(0)
    tnet = TorchUNet(in_channels=8, depth=3, start_filts=8)
    tnet.eval()
    x = rng.normal(size=(2, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()

    sd = {f"unet.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = tc.unet(sd, "unet", depth=3)

    from pcaccumulation_tpu.models.unet import UNet

    ours = UNet(in_channels=8, depth=3, start_filts=8).apply(
        {"params": params}, jnp.asarray(to_nhwc(x))
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), atol=2e-4)


def test_seg_head_2d_parity(rng):
    from models.unet import SegHead2D as TorchSegHead2D

    torch.manual_seed(1)
    tnet = TorchSegHead2D(16, 2)
    tnet.eval()
    # non-trivial running stats
    tnet.seg_head[1].running_mean += torch.randn(16) * 0.1
    tnet.seg_head[1].running_var *= 1.3
    x = rng.normal(size=(3, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()

    sd = {f"h.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = tc.seg_head_2d(sd, "h")

    from pcaccumulation_tpu.models.layers import SegHead2D

    ours = SegHead2D(2).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(to_nhwc(x)), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), atol=2e-4)


def test_seg_head_1d_parity(rng):
    from models.unet import SegHead1D as TorchSegHead1D

    torch.manual_seed(2)
    tnet = TorchSegHead1D(32, 2)
    tnet.eval()
    tnet.seg_head[1].running_mean += torch.randn(32) * 0.1
    tnet.seg_head[1].running_var *= 0.8
    x = rng.normal(size=(50, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()

    sd = {f"h.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = tc.seg_head_1d(sd, "h")

    from pcaccumulation_tpu.models.layers import SegHead1D

    ours = SegHead1D(2).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_conv3d_parity(rng):
    torch.manual_seed(3)
    tconv = torch.nn.Conv3d(4, 6, 3, padding=1)
    x = rng.normal(size=(2, 4, 3, 8, 8)).astype(np.float32)  # [B,C,T,H,W]
    with torch.no_grad():
        ref = tconv(torch.tensor(x)).numpy()

    sd = {"c.weight": tconv.weight.detach().numpy(),
          "c.bias": tconv.bias.detach().numpy()}
    p = tc.conv3d(sd, "c")

    import flax.linen as nn

    x_cl = np.moveaxis(x, 1, -1)  # [B,T,H,W,C]
    ours = nn.Conv(6, (3, 3, 3), padding=1).apply(
        {"params": p}, jnp.asarray(x_cl)
    )
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(ref, 1, -1), atol=2e-4)


class _TorchResnetBlockFC(torch.nn.Module):
    """Literal re-execution of pillar_encoder.py:13-55 (the module itself
    is not importable here: pillar_encoder.py pulls in torch_scatter)."""

    def __init__(self, size_in, size_out):
        super().__init__()
        size_h = min(size_in, size_out)
        self.fc_0 = torch.nn.Linear(size_in, size_h)
        self.fc_1 = torch.nn.Linear(size_h, size_out)
        self.shortcut = (
            None if size_in == size_out
            else torch.nn.Linear(size_in, size_out, bias=False)
        )
        torch.nn.init.zeros_(self.fc_1.weight)

    def forward(self, x):
        net = self.fc_0(torch.relu(x))
        dx = self.fc_1(torch.relu(net))
        x_s = x if self.shortcut is None else self.shortcut(x)
        return x_s + dx


def test_resnet_block_parity(rng):
    torch.manual_seed(4)
    tblk = _TorchResnetBlockFC(64, 32)
    # fc_1 is zero-init in the reference; give it real values for the test
    torch.nn.init.normal_(tblk.fc_1.weight, std=0.1)
    x = rng.normal(size=(20, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tblk(torch.tensor(x)).numpy()

    sd = {f"b.{k}": v.numpy() for k, v in tblk.state_dict().items()}
    p = tc.resnet_block(sd, "b")

    from pcaccumulation_tpu.models.layers import ResnetBlockFC

    ours = ResnetBlockFC(32).apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_full_state_dict_converts_into_model_tree():
    """Round trip: a synthetic state dict shaped like the reference model
    must convert into exactly our MotionNet parameter tree."""
    from test_model import tiny_cfg, tiny_batch
    from pcaccumulation_tpu.models import MotionNet

    cfg = tiny_cfg()
    # tiny_cfg shrinks the op-graph for the behavioural tests; the converter
    # round-trip must cover the PRODUCTION parameter tree (depth-5 unet,
    # depth-3 pillar encoder) that build_reference_shaped_state_dict emits.
    cfg["unet"]["depth"] = 5
    cfg["pillar_encoder"]["depth"] = 3
    batch = tiny_batch(cfg)
    model = MotionNet(cfg)
    jbatch = jax.tree.map(jnp.asarray, batch)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )

    sd = build_reference_shaped_state_dict(cfg)
    params, stats = tc.convert_state_dict(sd, pillar_depth=cfg["pillar_encoder"]["depth"])

    # identical tree structure + shapes for params we convert
    def check(ours, converted, path=""):
        assert set(converted.keys()) <= set(ours.keys()), (
            path, set(converted) - set(ours))
        for k, v in converted.items():
            if isinstance(v, dict):
                check(ours[k], v, path + "/" + k)
            else:
                assert np.shape(ours[k]) == np.shape(v), (path + "/" + k,
                                                          np.shape(ours[k]), np.shape(v))

    check(variables["params"], params)
    check(variables.get("batch_stats", {}), stats)
    # and the full conversion covers every parameter of the model
    n_ours = len(jax.tree.leaves(variables["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_ours, (n_conv, n_ours)


def build_reference_shaped_state_dict(cfg):
    """Construct a torch state dict with the reference's exact module names
    and shapes for the tiny config (depth-3 pillar encoder, depth-5 unet,
    64-ch ego feats, STPN widths, TPointNet regressor)."""
    sd = {}
    rng = np.random.default_rng(0)

    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def conv(prefix, i, o, k=3):
        sd[f"{prefix}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def convT(prefix, i, o, k=2):
        sd[f"{prefix}.weight"] = rng.normal(size=(i, o, k, k)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def conv3(prefix, i, o, k=3):
        sd[f"{prefix}.weight"] = rng.normal(size=(o, i, k, k, k)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    nf = cfg["pillar_encoder"]["num_filters"]  # 32
    lin("pillar_encoder.fc_pos", 9, 2 * nf)
    for i in range(cfg["pillar_encoder"]["depth"]):
        lin(f"pillar_encoder.blocks.{i}.fc_0", 2 * nf, nf)
        lin(f"pillar_encoder.blocks.{i}.fc_1", nf, nf)
        sd[f"pillar_encoder.blocks.{i}.shortcut.weight"] = rng.normal(
            size=(nf, 2 * nf)
        ).astype(np.float32)
    lin("pillar_encoder.fc_c", nf, nf)

    def unet_sd(prefix, in_ch, depth, start):
        outs = start
        ins = in_ch
        for i in range(depth):
            outs = start * (2 ** i)
            conv(f"{prefix}.down_convs.{i}.conv1", ins, outs)
            conv(f"{prefix}.down_convs.{i}.conv2", outs, outs)
            ins = outs
        for i in range(depth - 1):
            o = outs // 2
            convT(f"{prefix}.up_convs.{i}.upconv", outs, o)
            conv(f"{prefix}.up_convs.{i}.conv1", 2 * o, o)
            conv(f"{prefix}.up_convs.{i}.conv2", o, o)
            outs = o
        conv(f"{prefix}.conv_final", outs, in_ch)

    unet_sd("unet", 32, 5, 32)

    for head, o in (("semseg_head", 2), ("ego_feats_head", 64)):
        mid = max(32, o)
        conv(f"{head}.seg_head.0", 32, mid)
        bn(f"{head}.seg_head.1", mid)
        conv(f"{head}.seg_head.3", mid, o)

    sd["ego_motion_head.alpha"] = np.float32(-5.0)
    sd["ego_motion_head.beta"] = np.float32(-5.0)

    # STPN
    for i, ti in enumerate((0, 2, 4, 6)):
        conv3(f"motionhead.init_conv.{ti}", 32, 32)
    widths = [max(64, w) for w in [32, 64, 128, 128, 256]]
    ins = 32
    for i, w in enumerate(widths):
        conv(f"motionhead.down_convs.{i}.conv1", ins, w)
        conv(f"motionhead.down_convs.{i}.conv2", w, w)
        ins = w
    up_w = [max(64, w) for w in [128, 128, 64, 32]]
    for i, w in enumerate(up_w):
        convT(f"motionhead.up_convs.{i}.upconv", ins, w)
        conv(f"motionhead.up_convs.{i}.conv1", 2 * w, w)
        conv(f"motionhead.up_convs.{i}.conv2", w, w)
        ins = w
    lin("motionhead.positional_encoding.0", 3, 32)
    lin("motionhead.positional_encoding.2", 32, 64)
    lin("motionhead.final_proj.0", 128, 128)
    for head in ("mos_seg", "offset_head"):
        lin(f"motionhead.{head}.seg_head.0", 128, 128)
        bn(f"motionhead.{head}.seg_head.1", 128)
        lin(f"motionhead.{head}.seg_head.3", 128, 2)

    # TPointNet
    for name, dims in (("geo_embed", (32, 32, 64, 128)),
                       ("motion_embed", (64, 64, 128, 128)),
                       ("pos_embed", (4, 32, 64, 128))):
        for j, ti in enumerate((0, 2, 4)):
            lin(f"reconstructor.alignment.{name}.{ti}", dims[j], dims[j + 1])
    lin("reconstructor.alignment.regressor.0", 512, 256)
    bn("reconstructor.alignment.regressor.1", 256)
    lin("reconstructor.alignment.regressor.3", 256, 128)
    bn("reconstructor.alignment.regressor.4", 128)
    lin("reconstructor.alignment.regressor.6", 128, 7)
    return sd


def test_convert_ckpt_cli(tmp_path):
    """tools/convert_ckpt.py: reference .pth dict -> loadable .ckpt."""
    import sys

    import torch

    from pcaccumulation_tpu.config import load_config, derive
    from pcaccumulation_tpu.utils.checkpoint import load_checkpoint

    sys.path.insert(0, "tools")
    import convert_ckpt

    cfg = load_config()
    cfg["voxel_generator"]["n_sweeps"] = 3
    cfg = derive(cfg)
    sd = build_reference_shaped_state_dict(cfg)
    src = tmp_path / "ref.pth"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()},
                "epoch": 77, "best_metric": 0.87796}, str(src))
    dst = tmp_path / "converted.ckpt"
    assert convert_ckpt.main(["convert_ckpt", str(src), str(dst)]) == 0
    state = load_checkpoint(str(dst))
    assert state["epoch"] == 77
    assert abs(state["best_metric"] - 0.87796) < 1e-9
    assert "unet" in state["params"] and "semseg_head" in state["batch_stats"]
