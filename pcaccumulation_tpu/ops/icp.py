"""Batched point-to-point ICP — the reference's optional Open3D refinement.

JAX equivalent of refine_pose_with_icp (models/egomotion.py:9-28) and
AlignNet.run_icp (models/alignnet.py:54-92): nearest neighbours within a
correspondence threshold, Kabsch update, fixed iteration count (Open3D's
convergence criteria become a static max_iterations — extra iterations on
converged problems are no-ops). Default-off in configs, matching
configs/default.yaml:115-117 of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcaccumulation_tpu.kernels.chamfer import nn_bruteforce_ref, nn_pallas
from pcaccumulation_tpu.ops import se3
from pcaccumulation_tpu.ops.kabsch import weighted_kabsch


def icp_point_to_point(
    src,
    tgt,
    src_valid,
    tgt_valid,
    init_pose=None,
    threshold: float = 0.15,
    max_iterations: int = 50,
    use_pallas: bool = False,
):
    """Refine a rigid pose aligning src -> tgt.

    src [N, 3], tgt [M, 3], masks bool. Returns the refined [4, 4] pose
    (composed with init_pose like egomotion.py:25: tsfm @ initial_pose).
    """
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=src.dtype)
    src0 = se3.apply_transform(src, init_pose)

    nn_fn = nn_pallas if use_pallas else nn_bruteforce_ref

    def body(_, carry):
        pose, src_t = carry
        d2, idx = nn_fn(src_t, tgt, tgt_valid)
        w = ((d2 < threshold * threshold) & src_valid).astype(src.dtype)
        rot, trans = weighted_kabsch(src_t, tgt[idx], w)
        delta = se3.make_transform(rot, trans)
        return se3.compose(delta, pose), se3.apply_transform(src_t, delta)

    pose, _ = jax.lax.fori_loop(
        0, max_iterations, body,
        (jnp.eye(4, dtype=src.dtype), src0),
    )
    return se3.compose(pose, init_pose)
