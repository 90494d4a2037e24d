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
