import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pcaccumulation_tpu.ops.icp import icp_point_to_point
from pcaccumulation_tpu.ops import se3


def test_icp_recovers_small_pose(rng):
    tgt = (rng.random((500, 3)) * 8).astype(np.float32)
    rot = Rotation.from_euler("z", 4.0, degrees=True).as_matrix().astype(np.float32)
    trans = np.array([0.08, -0.05, 0.02], np.float32)
    # src = inverse-transformed target points (so aligning src->tgt needs (rot, trans))
    src = ((tgt - trans) @ rot).astype(np.float32)

    pose = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(len(src), bool), jnp.ones(len(tgt), bool),
        threshold=0.5, max_iterations=20,
    )
    expected = np.eye(4, dtype=np.float32)
    expected[:3, :3] = rot
    expected[:3, 3] = trans
    rot_err = float(se3.rotation_error_deg(pose[:3, :3], jnp.asarray(rot)))
    trans_err = float(np.linalg.norm(np.asarray(pose[:3, 3]) - trans))
    assert rot_err < 0.2, rot_err
    assert trans_err < 0.02, trans_err


def test_icp_composes_init_pose(rng):
    tgt = (rng.random((300, 3)) * 5).astype(np.float32)
    src = tgt.copy()
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = [1.0, 0.0, 0.0]  # wrong init: shifts src away
    pose = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(len(src), bool), jnp.ones(len(tgt), bool),
        init_pose=jnp.asarray(init), threshold=2.0, max_iterations=30,
    )
    # refined pose must undo the bad init: pose ~ identity overall
    moved = np.asarray(se3.apply_transform(jnp.asarray(src), pose))
    assert np.abs(moved - tgt).max() < 0.05
