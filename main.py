"""CLI entry point — mirrors the reference's main.py:17-85.

    python main.py <config.yaml> <batch_size> <iter_size> [--a.b.c=value ...]

Modes (--misc.mode=train|val|test):
  train — full training loop with per-epoch validation + rolling checkpoints
  val   — one validation epoch, printing the reference-format metric line
  test  — per-scene scene-flow dumps + MOS / cluster evaluation
"""

from __future__ import annotations

import json
import os
import sys

from pcaccumulation_tpu.config import load_config, save_config
from pcaccumulation_tpu.data.dataset import SceneDataset
from pcaccumulation_tpu.data.loader import make_loader
from pcaccumulation_tpu.models import MotionNet
from pcaccumulation_tpu.utils.logging import setup_seed


def build_loaders(cfg):
    import jax

    loaders = {}
    for split, bs_key in (("train", "train"), ("val", "val"), ("test", "test")):
        try:
            ds = SceneDataset(cfg, split)
        except FileNotFoundError:
            continue
        loaders[split] = make_loader(
            ds,
            batch_size=cfg[bs_key]["batch_size"],
            shuffle=(split == "train"),
            num_workers=cfg[bs_key]["num_workers"],
            drop_last=(split != "test"),
            seed=cfg["misc"]["seed"],
            # multi-host: each process loads a disjoint slice
            process_id=jax.process_index(),
            process_count=jax.process_count(),
        )
    return loaders


def snapshot_source(save_dir):
    """Copy the framework source into the run dir for reproducibility
    (reference main.py:43-47 copies libs/ + models/)."""
    import shutil

    root = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(save_dir, "src_snapshot")
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(
        os.path.join(root, "pcaccumulation_tpu"),
        os.path.join(dst, "pcaccumulation_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"),
    )
    shutil.copy2(os.path.join(root, "main.py"), dst)


def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 1
    config_path, batch_size, iter_size = argv[1], int(argv[2]), int(argv[3])
    cfg = load_config(config_path, overrides=argv[4:])
    cfg["train"]["batch_size"] = batch_size
    cfg["train"]["iter_size"] = iter_size
    setup_seed(cfg["misc"]["seed"])

    # data-parallel mesh: every sharded batch's leading axis must divide
    # by the mesh size — align the val loader with the train batch
    n_dev = cfg.get("parallel", {}).get("num_devices", 1)
    if n_dev != 1:
        import jax

        mesh_size = len(jax.devices()) if n_dev == 0 else n_dev
        if batch_size % mesh_size:
            raise SystemExit(
                f"batch_size {batch_size} not divisible by the "
                f"{mesh_size}-device data mesh"
            )
        if cfg["val"]["batch_size"] % mesh_size:
            cfg["val"]["batch_size"] = batch_size

    save_dir = os.path.join("snapshot", cfg["misc"]["exp_name"])
    os.makedirs(save_dir, exist_ok=True)
    save_config(cfg, os.path.join(save_dir, "config.json"))
    snapshot_source(save_dir)

    model = MotionNet(cfg)
    loaders = build_loaders(cfg)

    # data-parallel mesh: parallel.num_devices > 1 shards batches over
    # the local devices (0 = all); XLA inserts the gradient psums
    mesh = None
    n_dev = cfg.get("parallel", {}).get("num_devices", 1)
    if n_dev != 1:
        from pcaccumulation_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(None if n_dev == 0 else n_dev)

    mode = cfg["misc"]["mode"]
    if mode in ("train", "val"):
        from pcaccumulation_tpu.train.trainer import Trainer

        trainer = Trainer(cfg, model, loaders, save_dir=save_dir, mesh=mesh)
        if mode == "train":
            trainer.train()
        else:
            trainer.eval()
    elif mode == "test":
        from pcaccumulation_tpu.train.tester import Tester

        Tester(cfg, model, save_dir=save_dir).test()
    else:
        raise NotImplementedError(mode)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
