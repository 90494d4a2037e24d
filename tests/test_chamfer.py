"""Chamfer / NN op: reference implementation semantics + gradient scatter.

The Pallas kernel itself only runs on TPU (tests/tpu/test_pallas_tpu.py
covers kernel-vs-reference parity on hardware); these tests pin down the
op semantics on the jnp reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pcaccumulation_tpu.kernels.chamfer import (
    chamfer_distance,
    nn_bruteforce_ref,
)


def test_nn_bruteforce(rng):
    a = rng.normal(size=(40, 3)).astype(np.float32)
    b = rng.normal(size=(60, 3)).astype(np.float32)
    d2, idx = nn_bruteforce_ref(jnp.asarray(a), jnp.asarray(b))
    full = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), full.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), full.argmin(1))


def test_nn_respects_validity(rng):
    a = rng.normal(size=(10, 3)).astype(np.float32)
    b = np.concatenate([rng.normal(size=(20, 3)), np.zeros((5, 3))]).astype(np.float32)
    valid = np.concatenate([np.ones(20, bool), np.zeros(5, bool)])
    d2, idx = nn_bruteforce_ref(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))
    assert np.all(np.asarray(idx) < 20)


def _torch_chamfer(a, b):
    """Reference semantics: squared NN distance both ways
    (chamfer_distance.cpp:59-111)."""
    d = ((torch.tensor(a)[:, None] - torch.tensor(b)[None]) ** 2).sum(-1)
    return d.min(1).values, d.min(0).values


def test_chamfer_matches_reference(rng):
    a = rng.normal(size=(30, 3)).astype(np.float32)
    b = rng.normal(size=(45, 3)).astype(np.float32)
    va = np.ones(30, bool)
    vb = np.ones(45, bool)
    d_a, d_b = chamfer_distance(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(va), jnp.asarray(vb)
    )
    ref_a, ref_b = _torch_chamfer(a, b)
    np.testing.assert_allclose(np.asarray(d_a), ref_a.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), ref_b.numpy(), rtol=1e-4, atol=1e-5)


def test_chamfer_gradient_matches_torch(rng):
    a = rng.normal(size=(25, 3)).astype(np.float32)
    b = rng.normal(size=(35, 3)).astype(np.float32)
    va = jnp.ones(25, bool)
    vb = jnp.ones(35, bool)

    def loss(a_, b_):
        d_a, d_b = chamfer_distance(a_, b_, va, vb)
        return jnp.sum(d_a) * 0.7 + jnp.sum(d_b) * 1.3

    ga, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))

    ta = torch.tensor(a, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)
    d = ((ta[:, None] - tb[None]) ** 2).sum(-1)
    tl = d.min(1).values.sum() * 0.7 + d.min(0).values.sum() * 1.3
    tl.backward()
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_chamfer_masked_rows_zero_grad(rng):
    a = rng.normal(size=(16, 3)).astype(np.float32)
    b = rng.normal(size=(16, 3)).astype(np.float32)
    va = jnp.asarray(np.arange(16) < 8)
    vb = jnp.ones(16, bool)

    def loss(a_):
        d_a, _ = chamfer_distance(a_, jnp.asarray(b), va, vb)
        return jnp.sum(d_a)

    g = jax.grad(loss)(jnp.asarray(a))
    assert np.all(np.asarray(g)[8:] == 0)
    assert np.all(np.isfinite(np.asarray(g)))
