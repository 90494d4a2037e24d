"""pcaccumulation_tpu — TPU-native multi-frame LiDAR point-cloud accumulation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
prs-eth/PCAccumulation ("Dynamic 3D Scene Analysis by Point Cloud
Accumulation", ECCV 2022): joint ego-motion estimation, foreground /
background segmentation, motion segmentation, offset-based instance
clustering and per-instance rigid motion regression over short LiDAR
sequences.

Design stance (vs. the reference single-GPU PyTorch code):
  * static capacities + masks everywhere (MAX_POINTS / MAX_PILLARS /
    MAX_INSTANCES) so the full pipeline jit-compiles end-to-end;
  * `vmap` over batch and frame instead of Python loops;
  * XLA convolutions + batched linear algebra on the MXU, Pallas kernels
    for the scatter / nearest-neighbour hot paths;
  * data parallelism over a `jax.sharding.Mesh` instead of no parallelism.
"""

__version__ = "0.1.0"
