import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pcaccumulation_tpu.ops import se3


def random_tsfm(rng, n=()):
    rot = Rotation.random(int(np.prod(n)) if n else 1, random_state=rng.integers(1 << 30))
    mats = rot.as_matrix().reshape(n + (3, 3))
    trans = rng.normal(size=n + (3,))
    out = np.tile(np.eye(4), n + (1, 1))
    out[..., :3, :3] = mats
    out[..., :3, 3] = trans
    return out.astype(np.float64)


def test_inverse_and_compose(rng):
    t = random_tsfm(rng, (5,))
    inv = se3.transform_inverse(jnp.asarray(t))
    eye = se3.compose(jnp.asarray(t), inv)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(4), (5, 1, 1)), atol=1e-6)


def test_apply_transform(rng):
    t = random_tsfm(rng)
    pts = rng.normal(size=(7, 3))
    out = se3.apply_transform(jnp.asarray(pts), jnp.asarray(t))
    expected = (t[:3, :3] @ pts.T).T + t[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_relative_pose(rng):
    a, b = random_tsfm(rng), random_tsfm(rng)
    rel = se3.relative_pose(jnp.asarray(a), jnp.asarray(b))
    expected = np.linalg.inv(b) @ a
    np.testing.assert_allclose(np.asarray(rel), expected, atol=1e-6)


def test_ego_motion_compensation(rng):
    T = 4
    tsfm = random_tsfm(rng, (T,))
    pts = rng.normal(size=(20, 3))
    tid = rng.integers(0, T, size=20)
    out = se3.ego_motion_compensation(jnp.asarray(pts), jnp.asarray(tid), jnp.asarray(tsfm))
    expected = np.stack([tsfm[t, :3, :3] @ p + tsfm[t, :3, 3] for p, t in zip(pts, tid)])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_reconstruct_sequence(rng):
    K, T = 3, 4
    tsfm = random_tsfm(rng, (K, T))
    pts = rng.normal(size=(30, 3))
    tid = rng.integers(0, T, size=30)
    iid = rng.integers(0, K, size=30)
    out = se3.reconstruct_sequence(
        jnp.asarray(pts), jnp.asarray(tid), jnp.asarray(iid), jnp.asarray(tsfm)
    )
    expected = np.stack(
        [tsfm[k, t, :3, :3] @ p + tsfm[k, t, :3, 3] for p, t, k in zip(pts, tid, iid)]
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_rotation_error(rng):
    angle = 37.0
    r1 = Rotation.from_euler("z", angle, degrees=True).as_matrix()
    err = se3.rotation_error_deg(jnp.asarray(np.eye(3)[None]), jnp.asarray(r1[None]))
    np.testing.assert_allclose(np.asarray(err), [angle], atol=1e-4)


def test_quat_roundtrip(rng):
    rots = Rotation.random(50, random_state=3)
    mats = rots.as_matrix()
    q = se3.matrix_to_quat(jnp.asarray(mats))
    back = se3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)
    # matches scipy convention up to sign
    q_scipy = rots.as_quat()
    q_np = np.asarray(q)
    dot = np.abs(np.sum(q_np * q_scipy, axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_to_matrix_matches_scipy(rng):
    q = rng.normal(size=(20, 4))
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    mats = se3.quat_to_matrix(jnp.asarray(q))
    expected = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(np.asarray(mats), expected, atol=1e-5)
