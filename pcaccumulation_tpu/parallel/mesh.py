"""Data + frame (sequence) parallelism over a `jax.sharding.Mesh`.

The reference is single-GPU (SURVEY.md §2.4: the only torch.distributed
code is dead); parallelism over ICI is a new first-class component of the
rebuild. Design = the standard JAX recipe: a `data` mesh axis with batches
sharded on their leading axis, parameters replicated, and XLA inserting
the psum for the gradient all-reduce from the sharding annotations alone —
no hand-written collectives.

A second, optional `frame` mesh axis shards the per-frame backbone
(BEV canvas -> UNet -> FB/ego heads) over the temporal LiDAR frames:
SURVEY.md §2.4 — the per-frame UNet is embarrassingly parallel across T
until the STPN temporal fusion, where one XLA-inserted all-gather folds
the frames back together (sharding constraints in models/motionnet.py,
active when `parallel.frame_devices > 1`). GSPMD pads uneven frame counts
(T=11 nuScenes / T=5 Waymo shard fine over 2 or 4 devices).

A third, optional `spatial` mesh axis shards the BEV grid's row (H) axis
through the same backbone — spatial partitioning, the conv-net analogue
of tensor parallelism: each device holds a horizontal band of the
288x288 canvas and GSPMD inserts the halo exchanges
(collective-permutes) every convolution needs at its band boundary, plus
the cross-band all-reduces for the BatchNorm statistics. The fold
all-gathers the bands back together with the frames. Active when
`parallel.spatial_devices > 1`; composes freely with `data` and `frame`
on a 3-D mesh.

Pipeline and expert parallelism are deliberately absent: the 11 M-param
model fits on one chip thousands of times over (PP's microbatch bubble
would buy nothing the data axis doesn't), and there are no experts to
route. The scale-out axes that exist — data, frame, spatial, ZeRO-1 —
cover the model's actual structure.

Works identically on real TPU meshes and on the CPU-simulated 8-device
mesh used by tests (`--xla_force_host_platform_device_count=8`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FRAME_AXIS = "frame"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: int | None = None, devices=None,
              frame_devices: int = 1, spatial_devices: int = 1) -> Mesh:
    """1-D `(data,)` mesh, or — with frame_devices / spatial_devices > 1 —
    a 2-D/3-D `(data[, frame][, spatial])` mesh of shape
    (n // (frame * spatial), frame, spatial) for hybrid data x sequence x
    spatial parallelism. Model axes (frame, spatial) are placed LAST so
    they map to the innermost (fastest, adjacent-device) ICI dimension —
    halo exchanges and the fold all-gather ride neighbour links, the
    lower-frequency gradient psum crosses the outer `data` dimension."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    model_factor = frame_devices * spatial_devices
    if model_factor > 1:
        if len(devices) % model_factor:
            raise ValueError(
                f"{len(devices)} devices do not factor into a "
                f"(data={len(devices) // model_factor} x "
                f"frame={frame_devices} x spatial={spatial_devices}) mesh"
            )
        shape = [len(devices) // model_factor]
        axes = [DATA_AXIS]
        if frame_devices > 1:
            shape.append(frame_devices)
            axes.append(FRAME_AXIS)
        if spatial_devices > 1:
            shape.append(spatial_devices)
            axes.append(SPATIAL_AXIS)
        return Mesh(np.array(devices).reshape(shape), tuple(axes))
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def ambient_mesh_axes() -> tuple:
    """Axis names of the active mesh context (`with mesh:`), or () when no
    mesh is ambient. Gates MotionNet's bare-PartitionSpec sharding
    constraints: tracing them without a mesh raises on jax 0.9, and
    inference entry points (Tester, serve) legitimately build the model
    from a training run's config — with `parallel.frame_devices > 1` saved
    in it — without entering any mesh (the constraints are a no-op wish in
    that case, not an error)."""
    try:  # jax 0.9: `with mesh:` sets the thread-local physical mesh
        from jax._src import mesh as mesh_lib

        env_mesh = mesh_lib.thread_resources.env.physical_mesh
        if not env_mesh.empty:
            return tuple(env_mesh.axis_names)
    except (ImportError, AttributeError):
        pass
    try:  # newer jax: jax.sharding.use_mesh sets the abstract mesh
        am = jax.sharding.get_abstract_mesh()
        if not am.empty:
            return tuple(am.axis_names)
    except (ImportError, AttributeError):
        pass
    return ()


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh):
    """Shard every batch leaf on its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


# ------------------------------------------------------------------- ZeRO-1
def zero1_specs(opt_state, mesh: Mesh):
    """PartitionSpec tree sharding the optimizer state over the data axis.

    ZeRO-1 (Rajbhandari et al., 2019) the XLA way: instead of manual
    reduce-scatter/all-gather choreography, each parameter-shaped leaf of
    the optimizer state (adam mu/nu, MultiSteps grad accumulators) is
    annotated as sharded over `data` on its largest evenly-divisible
    dimension, and GSPMD derives the collectives — the elementwise moment
    update slices the replicated gradient for free, and one all-gather
    materialises the parameter update. Scalar leaves (step counters,
    notfinite counts) and leaves with no divisible dimension stay
    replicated. The reference has no analogue (single GPU, SURVEY §2.4);
    this is a rebuild-native scaling feature: optimizer memory per device
    drops ~data-ways (adam: 2 extra param-sized trees, 3 with iter_size
    accumulation).
    """
    n_data = mesh.shape[DATA_AXIS]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if n_data <= 1 or not shape:
            return P()
        # largest divisible dim hosts the shard (balanced + keeps small
        # trailing dims, e.g. conv kernels' [3,3,C,F] shard on F)
        cands = [d for d in range(len(shape)) if shape[d] % n_data == 0]
        if not cands:
            return P()
        axis = max(cands, key=lambda d: shape[d])
        parts = [None] * len(shape)
        parts[axis] = DATA_AXIS
        return P(*parts)

    return jax.tree.map(spec, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place the optimizer state ZeRO-1-sharded on the mesh (see
    zero1_specs). Returns (sharded_state, spec_tree)."""
    specs = zero1_specs(opt_state, mesh)
    state = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs,
    )
    return state, specs


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
        except (ValueError, RuntimeError) as e:
            # no cluster env detected — single-process run. Say so: a pod
            # whose auto-detect fails for a FIXABLE reason (bad hostnames,
            # stale coordinator) must not degrade silently.
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed auto-detect failed (%s: %s); "
                "continuing single-process", type(e).__name__, e,
            )
            return
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
