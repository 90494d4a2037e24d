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


def enable_compile_cache():
    """Persistent XLA compile cache: repeat CLI runs (resume, val sweeps,
    the README sanity check) skip the minutes-long first TPU compile.
    Same repo-local cache dir as __graft_entry__ / tests/conftest."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (RuntimeError, OSError):
        pass  # cache is an optimisation, never a hard requirement


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
            mode=cfg[bs_key].get("worker_mode", "thread"),
            drop_last=(split != "test"),
            seed=cfg["misc"]["seed"],
            # multi-host: each process loads a disjoint slice
            process_id=jax.process_index(),
            process_count=jax.process_count(),
        )
    return loaders


def resolve_mesh_geometry(cfg, batch_size) -> int:
    """Validate/derive the (data x frame x spatial) mesh geometry.

    Returns the resolved mesh total (= parallel.num_devices; 0 = all local
    devices; when only the model-axis factors are set, the total is
    inferred as frame_devices x spatial_devices). Every sharded batch's
    leading axis must divide by the mesh's DATA factor — the val loader is
    aligned with the train batch when it doesn't. Raises SystemExit with
    an actionable message on an impossible geometry."""
    n_dev = cfg.get("parallel", {}).get("num_devices", 1)
    n_frame = cfg.get("parallel", {}).get("frame_devices", 1)
    n_spatial = cfg.get("parallel", {}).get("spatial_devices", 1)
    model_factor = n_frame * n_spatial
    mesh_size = n_dev
    if n_dev != 1 or model_factor > 1:
        import jax

        if n_dev == 1 and model_factor > 1:
            # only the model-axis factors were set: infer the mesh total
            # (a pure model-parallel (1 data x frame x spatial) mesh)
            mesh_size = model_factor
        else:
            mesh_size = len(jax.devices()) if n_dev == 0 else n_dev
        if mesh_size % model_factor:
            raise SystemExit(
                f"parallel.num_devices (={mesh_size}; 0 = all local devices) "
                f"must be a multiple of frame_devices {n_frame} x "
                f"spatial_devices {n_spatial} = {model_factor}"
            )
        data_size = mesh_size // model_factor
        if batch_size % data_size:
            raise SystemExit(
                f"batch_size {batch_size} not divisible by the "
                f"{data_size}-way data axis of the mesh"
            )
        if cfg["val"]["batch_size"] % data_size:
            cfg["val"]["batch_size"] = batch_size
    return mesh_size


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
    enable_compile_cache()

    mesh_size = resolve_mesh_geometry(cfg, batch_size)

    save_dir = os.path.join("snapshot", cfg["misc"]["exp_name"])
    os.makedirs(save_dir, exist_ok=True)
    save_config(cfg, os.path.join(save_dir, "config.json"))
    snapshot_source(save_dir)

    model = MotionNet(cfg)
    loaders = build_loaders(cfg)

    # parallel mesh: num_devices > 1 shards batches over the data axis
    # (0 = all local devices); frame_devices > 1 additionally shards the
    # per-frame backbone over the temporal frames; spatial_devices > 1
    # over the BEV rows. XLA inserts every collective (gradient psums,
    # frame/band all-gathers, conv halo exchanges) from the annotations.
    mesh = None
    n_frame = cfg.get("parallel", {}).get("frame_devices", 1)
    n_spatial = cfg.get("parallel", {}).get("spatial_devices", 1)
    if mesh_size != 1 or n_frame * n_spatial > 1:
        from pcaccumulation_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(None if mesh_size == 0 else mesh_size,
                         frame_devices=n_frame, spatial_devices=n_spatial)

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
