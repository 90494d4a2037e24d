"""Multi-chip data parallelism on the simulated 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_shard_batch_placement():
    from pcaccumulation_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(4)
    batch = {"x": np.zeros((4, 16, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 4
    assert shards[0].data.shape == (1, 16, 3)


def test_trainer_on_mesh_epoch(tmp_path):
    """Full Trainer epoch with the batch sharded over a 4-device mesh:
    the jitted train step runs with XLA-inserted gradient psums and the
    loss decreases."""
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_cfg, tiny_batch

    from pcaccumulation_tpu.models import MotionNet
    from pcaccumulation_tpu.parallel.mesh import make_mesh
    from pcaccumulation_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    cfg["train"]["iter_size"] = 1
    batches = [tiny_batch(cfg, batch_size=4, seed=s) for s in (0, 1)]

    class FakeLoader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    mesh = make_mesh(4)
    trainer = Trainer(
        cfg, MotionNet(cfg), {"train": FakeLoader(), "val": FakeLoader()},
        save_dir=str(tmp_path), mesh=mesh,
    )
    m1 = trainer.inference_one_epoch(1, "train")
    m2 = trainer.inference_one_epoch(2, "train")
    assert np.isfinite(m2["loss"].avg)
    assert m2["loss"].avg < m1["loss"].avg
