"""Data parallelism over a `jax.sharding.Mesh`.

The reference is single-GPU (SURVEY.md §2.4: the only torch.distributed
code is dead); data parallelism over ICI is a new first-class component of
the rebuild. Design = the standard JAX recipe: a 1-D `data` mesh, batches
sharded on their leading axis, parameters replicated, and XLA inserting
the psum for the gradient all-reduce from the sharding annotations alone —
no hand-written collectives.

Works identically on real TPU meshes and on the CPU-simulated 8-device
mesh used by tests (`--xla_force_host_platform_device_count=8`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh):
    """Shard every batch leaf on its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
