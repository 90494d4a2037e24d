"""Sorted-segment scan kernel (kernels/segscan.py) vs segment-op reference.

The scan replaces the scatter-max + gather-back local pooling of the
reference PillarFeatureNet (models/pillar_encoder.py:113-121). Parity
targets: the XLA segment ops — values exact, gradients including the
even-tie-split routing of jax's segment_max VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcaccumulation_tpu.kernels.segscan import (
    _seg_pool_impl,
    seg_pool,
    seg_pool_ref,
)
from pcaccumulation_tpu.ops.segment import masked_seg_pool_max, masked_segment_max


def _sorted_ids(rng, n, m, long_run_at=None, run_len=0):
    ids = np.sort(rng.integers(0, m, size=n)).astype(np.int32)
    if long_run_at is not None:
        ids[long_run_at:long_run_at + run_len] = ids[long_run_at]
        ids = np.sort(ids)
    return ids


@pytest.mark.parametrize("op", ["max", "sum"])
@pytest.mark.parametrize("rblk", [128, 256])
def test_pallas_interpret_matches_reference(op, rblk):
    rng = np.random.default_rng(0)
    n, c = 1500, 32
    # long run crossing several blocks + empty segments + singletons
    ids = _sorted_ids(rng, n, 500, long_run_at=200, run_len=700)
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    out = _seg_pool_impl(x, jnp.asarray(ids), op=op, rblk=rblk, interpret=True)
    ref = seg_pool_ref(x, jnp.asarray(ids), op)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["max", "sum"])
def test_jnp_fallback_matches_reference(op):
    rng = np.random.default_rng(1)
    n, c = 777, 9  # non-multiple of any block size; narrow channels
    ids = _sorted_ids(rng, n, 300)
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    out = seg_pool(x, jnp.asarray(ids), op, 256, None)  # cpu -> jnp path
    ref = seg_pool_ref(x, jnp.asarray(ids), op)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_run_longer_than_whole_blocks():
    # one segment spanning ALL blocks exercises the grid carry chain
    n, c, rblk = 1024, 8, 128
    ids = jnp.zeros((n,), jnp.int32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((n, c)),
                    jnp.float32)
    out = _seg_pool_impl(x, ids, op="max", rblk=rblk, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(x).max(0), (n, c)),
                               rtol=1e-6)
    out = _seg_pool_impl(x, ids, op="sum", rblk=rblk, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(x).sum(0), (n, c)),
                               rtol=1e-4)


def test_masked_pool_matches_scatter_path_fwd_and_grad():
    """masked_seg_pool_max == masked_segment_max[] incl. tie gradients."""
    rng = np.random.default_rng(3)
    n, m, c = 4000, 1500, 16
    ids = jnp.asarray(_sorted_ids(rng, n, m))
    valid = jnp.asarray(rng.random(n) < 0.9)
    # bf16-quantized values force exact ties inside segments (~3% of rows
    # at production shapes) — the case where VJP tie routing matters
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    nseg = m + 1

    def old(xx):
        p = masked_segment_max(xx, ids, valid, nseg, indices_are_sorted=True)
        return p[ids]

    def new(xx):
        return masked_seg_pool_max(xx, ids, valid, nseg)

    np.testing.assert_allclose(np.asarray(old(x)), np.asarray(new(x)))

    g = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    g_old = jax.vjp(old, x)[1](g)[0]
    g_new = jax.vjp(new, x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(g_old), np.asarray(g_new),
                               rtol=1e-5, atol=1e-6)


def test_masked_segment_max_tie_split_even():
    """Deliberate duplicated maxima: the winner-mask core even-splits the
    segment cotangent among k ties (g/k each), matching jax's default
    segment_max VJP — the repo-wide tie contract."""
    ids = jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32)
    valid = jnp.asarray([True, True, True, False, True, True])
    # seg 0: three-way tie at 2.0 (one of them masked out -> only 2 count);
    # seg 1: two-way tie at 5.0
    x = jnp.asarray([[1.0], [2.0], [2.0], [2.0], [5.0], [5.0]], jnp.float32)
    g = jnp.asarray([[3.0], [8.0]], jnp.float32)

    def f(xx):
        return masked_segment_max(xx, ids, valid, 2, indices_are_sorted=True)

    np.testing.assert_allclose(np.asarray(f(x)), [[2.0], [5.0]])
    grad = jax.vjp(f, x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(grad),
                               [[0.0], [1.5], [1.5], [0.0], [4.0], [4.0]])
    # sanity: identical to jax's default VJP on the same masked problem
    def f_default(xx):
        masked = jnp.where(valid[:, None], xx, -1e30)
        return jax.ops.segment_max(masked, ids, num_segments=2)

    g_def = jax.vjp(f_default, x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_def))


def test_seg_pool_custom_vjp_tie_split():
    """Two tied argmax rows each receive HALF the segment cotangent sum."""
    ids = jnp.asarray([0, 0, 0, 1], jnp.int32)
    x = jnp.asarray([[1.0], [2.0], [2.0], [5.0]], jnp.float32)
    g = jnp.asarray([[1.0], [1.0], [1.0], [7.0]], jnp.float32)
    grad = jax.vjp(lambda xx: seg_pool(xx, ids, "max", 256, None), x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(grad),
                               [[0.0], [1.5], [1.5], [7.0]])
