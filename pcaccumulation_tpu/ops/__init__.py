"""Core numeric ops: SE(3) geometry, Kabsch, segment reductions, Sinkhorn,
bilinear BEV sampling, Lovász-Softmax, chamfer NN, clustering."""

from pcaccumulation_tpu.ops.se3 import (
    apply_transform,
    compose,
    ego_motion_compensation,
    euler_z_matrix,
    make_transform,
    quat_to_matrix,
    matrix_to_quat,
    reconstruct_sequence,
    relative_pose,
    rotation_error_deg,
    translation_error,
    transform_inverse,
)
from pcaccumulation_tpu.ops.kabsch import kabsch, weighted_kabsch
from pcaccumulation_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_sum,
    segment_min,
)
from pcaccumulation_tpu.ops.sinkhorn import log_sinkhorn
from pcaccumulation_tpu.ops.bilinear import (
    bilinear_sample,
    gather_bev,
    scatter_bev,
    warp_bev,
)
from pcaccumulation_tpu.ops.lovasz import lovasz_softmax
