"""Convert a reference PyTorch checkpoint to this framework's format.

    python tools/convert_ckpt.py <reference.pth> <out.ckpt>

Reads the reference's `torch.save` dict (libs/trainer.py:65-83: state_dict
+ epoch/best_loss/best_metric), converts every module's weights to the JAX
layout (OIHW->HWIO convs, ConvTranspose kernel flip, BN params vs stats —
see pcaccumulation_tpu/utils/torch_convert.py, parity-tested in
tests/test_convert.py), and writes a checkpoint loadable by
`--misc.pretrain=<out.ckpt>` for metric-parity validation runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcaccumulation_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from pcaccumulation_tpu.utils.torch_convert import load_torch_checkpoint  # noqa: E402


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    src, dst = argv[1], argv[2]
    params, batch_stats, meta = load_torch_checkpoint(src)
    state = {
        "params": params,
        "batch_stats": batch_stats,
        "epoch": meta.get("epoch", 0),
        "best_loss": meta.get("best_loss", 1e5),
        "best_metric": meta.get("best_metric", -1e5),
    }
    save_checkpoint(dst, state)
    n = sum(
        v.size for v in _leaves(params)
    )
    print(f"converted {src} -> {dst} ({n / 1e6:.2f}M params, "
          f"epoch {state['epoch']}, best_metric {state['best_metric']})")
    return 0


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main(sys.argv))
