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


# ----------------------------------------------------------------- multi-host
def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialise the JAX distributed runtime for multi-host training.

    On TPU pods the arguments auto-detect from the environment
    (jax.distributed.initialize() with no args); pass them explicitly for
    CPU/GPU clusters. No-op when already initialised. With explicit
    arguments, initialisation failures PROPAGATE (a mis-addressed
    coordinator must not silently fall back to single-host); only the
    argument-free auto-detect call downgrades to single-process when no
    cluster environment is found. Exercised by tests/test_multihost.py
    (2 CPU processes over the Gloo collective backend).
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return  # no cluster env detected — single-process run
    else:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def global_batch_from_host_local(batch: dict, mesh: Mesh):
    """Assemble globally-sharded device arrays from each host's local
    batch shard — the multi-host DCN input path (each host loads only its
    slice of the file list, see make_loader(process_id=...)). Falls back
    to plain shard_batch in single-process runs."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
