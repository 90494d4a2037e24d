import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pcaccumulation_tpu.ops.kabsch import weighted_kabsch, safe_svd


def test_recovers_exact_transform(rng):
    rot = Rotation.random(random_state=1).as_matrix()
    trans = rng.normal(size=3)
    src = rng.normal(size=(100, 3))
    tgt = (rot @ src.T).T + trans
    r_est, t_est = weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(r_est), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), trans, atol=1e-5)


def test_batched_and_weighted(rng):
    B = 4
    rots = Rotation.random(B, random_state=2).as_matrix()
    trans = rng.normal(size=(B, 3))
    src = rng.normal(size=(B, 64, 3))
    tgt = np.einsum("bij,bnj->bni", rots, src) + trans[:, None]
    # corrupt some points but zero their weights
    w = np.ones((B, 64))
    w[:, :10] = 0.0
    tgt_corrupt = tgt.copy()
    tgt_corrupt[:, :10] += rng.normal(size=(B, 10, 3)) * 10
    r_est, t_est = weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt_corrupt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r_est), rots, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), trans, atol=1e-5)


def test_det_flip_correction(rng):
    # mirrored targets force the det(V U^T) < 0 branch; result must stay a rotation
    src = rng.normal(size=(50, 3))
    tgt = src * np.array([1.0, 1.0, -1.0])
    r_est, _ = weighted_kabsch(jnp.asarray(src), jnp.asarray(tgt))
    det = np.linalg.det(np.asarray(r_est))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_safe_svd_grad_degenerate():
    # identical singular values: plain SVD grads are inf/nan, safe_svd is finite
    a = jnp.eye(3) * 2.0

    def loss(m):
        u, s, vt = safe_svd(m)
        return jnp.sum(u * 1.3) + jnp.sum(s) + jnp.sum(vt * 0.7)

    g = jax.grad(loss)(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_safe_svd_grad_matches_jnp_on_generic(rng):
    a = jnp.asarray(rng.normal(size=(3, 3)) + np.diag([3.0, 1.0, 0.2]))

    def loss_safe(m):
        u, s, vt = safe_svd(m)
        return jnp.sum(s * jnp.array([1.0, 2.0, 3.0])) + jnp.sum(jnp.sin(u)) + jnp.sum(jnp.cos(vt))

    def loss_ref(m):
        u, s, vt = jnp.linalg.svd(m, full_matrices=False)
        return jnp.sum(s * jnp.array([1.0, 2.0, 3.0])) + jnp.sum(jnp.sin(u)) + jnp.sum(jnp.cos(vt))

    g1 = jax.grad(loss_safe)(a)
    g2 = jax.grad(loss_ref)(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_kabsch_grad_finite_on_degenerate(rng):
    # coplanar points (rank-2 covariance) — the hard case from SURVEY §7
    src = rng.normal(size=(32, 3))
    src[:, 2] = 0.0
    tgt = src.copy()

    def loss(x):
        r, t = weighted_kabsch(x, jnp.asarray(tgt))
        return jnp.sum(r) + jnp.sum(t)

    g = jax.grad(loss)(jnp.asarray(src))
    assert np.all(np.isfinite(np.asarray(g)))
