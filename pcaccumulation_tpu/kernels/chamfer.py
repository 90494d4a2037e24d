"""Tiled brute-force nearest-neighbour / Chamfer distance — Pallas TPU kernel.

TPU-native replacement for the reference's CUDA extension
(chamfer_distance/chamfer_distance.cu:6-209 forward with shared-memory
tiling, chamfer_distance.cpp:114-177 gradient scatter): squared distance to
the nearest neighbour in each direction plus argmin indices, with a custom
VJP that scatters gradients through the argmins.

Design:
  * coordinates are padded 3 -> 8 lanes so the pairwise term runs as one
    MXU matmul per tile pair: d2 = |a|^2 + |b|^2 - 2 a.b^T;
  * the grid walks query tiles; each program streams all reference tiles
    from VMEM, keeping a running (min, argmin) pair;
  * invalid (padded) reference points are pushed to +inf so capacity
    padding never wins the argmin;
  * a pure-jnp reference implementation backs CPU tests and tiny inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30  # python float: jnp scalars become captured consts inside pallas


# --------------------------------------------------------------------- jnp ref
def nn_bruteforce_ref(a, b, b_valid=None):
    """[N,3], [M,3] -> (min squared dist [N], argmin [N])."""
    d2 = (
        jnp.sum(a * a, -1)[:, None]
        + jnp.sum(b * b, -1)[None, :]
        - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    )
    if b_valid is not None:
        d2 = jnp.where(b_valid[None, :], d2, _BIG)
    return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1).astype(jnp.int32)


# ------------------------------------------------------------------ pallas fwd
def _nn_kernel(a_ref, b_ref, bnorm_ref, bvalid_ref, dist_ref, idx_ref,
               *, block_m: int):
    """One query tile vs. all reference tiles.

    a_ref: [BLOCK_N, 8] query tile (VMEM)
    b_ref: [M, 8] full reference set (VMEM)
    bnorm_ref: [1, M] precomputed |b|^2 (+BIG for invalid)
    bvalid_ref: unused placeholder kept for layout symmetry
    """
    from jax.experimental import pallas as pl

    a = a_ref[:]                       # [BN, 8]
    a_norm = jnp.sum(a * a, axis=1, keepdims=True)  # [BN, 1]
    m_total = b_ref.shape[0]
    n_tiles = m_total // block_m

    def body(j, carry):
        best, best_idx = carry
        b_tile = b_ref[pl.ds(j * block_m, block_m), :]      # [BM, 8]
        bn = bnorm_ref[0, pl.ds(j * block_m, block_m)]      # [BM]
        prod = jnp.dot(a, b_tile.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        d2 = a_norm + bn[None, :] - 2.0 * prod              # [BN, BM]
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * block_m
        take = tile_min < best
        return jnp.where(take, tile_min, best), jnp.where(take, tile_arg, best_idx)

    init = (jnp.full((a.shape[0],), _BIG), jnp.zeros((a.shape[0],), jnp.int32))
    best, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[:, :] = best.reshape(dist_ref.shape)
    idx_ref[:, :] = best_idx.reshape(idx_ref.shape)


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_n", "block_m"))
def nn_pallas(a, b, b_valid=None, block_n: int = 1024, block_m: int = 1024):
    """Pallas nearest neighbour: a [N,3], b [M,3] -> (d2 [N], idx [N])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = a.shape[0], b.shape[0]
    n_pad = _round_up(max(n, 8), block_n)
    m_pad = _round_up(max(m, 8), block_m)

    # mean-centre for conditioning: |a|^2+|b|^2-2ab loses precision when
    # coordinates are far from the origin
    centre = jnp.mean(b, axis=0)
    a = a - centre
    b = b - centre

    a8 = jnp.zeros((n_pad, 8), jnp.float32).at[:n, :3].set(a.astype(jnp.float32))
    b8 = jnp.zeros((m_pad, 8), jnp.float32).at[:m, :3].set(b.astype(jnp.float32))

    bnorm = jnp.sum(b8 * b8, axis=1)
    invalid = jnp.arange(m_pad) >= m
    if b_valid is not None:
        invalid = invalid | ~_pad_to(b_valid, m_pad, False)
    bnorm = jnp.where(invalid, _BIG, bnorm)[None, :]  # [1, M]

    kernel = functools.partial(_nn_kernel, block_m=block_m)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
        ],
    )(a8, b8, bnorm, jnp.zeros((1, 1), jnp.int32))
    return dist.reshape(-1)[:n], idx.reshape(-1)[:n]


# ------------------------------------------------------------------ public op
@jax.custom_vjp
def chamfer_distance(a, b, a_valid, b_valid):
    """Bidirectional squared NN distance (ChamferDistance()(xyz1, xyz2)).

    a [N,3], b [M,3]; *_valid bool masks. Returns (dist_a [N], dist_b [M]).
    Invalid rows get distance 0.
    """
    d_a, d_b, _, _ = _chamfer_full(a, b, a_valid, b_valid)
    return d_a, d_b


def _use_pallas(a):
    return a.ndim == 2 and jax.default_backend() == "tpu"


def _chamfer_full(a, b, a_valid, b_valid):
    if _use_pallas(a):
        d_a, i_a = nn_pallas(a, b, b_valid)
        d_b, i_b = nn_pallas(b, a, a_valid)
    else:
        d_a, i_a = nn_bruteforce_ref(a, b, b_valid)
        d_b, i_b = nn_bruteforce_ref(b, a, a_valid)
    d_a = jnp.where(a_valid, d_a, 0.0)
    d_b = jnp.where(b_valid, d_b, 0.0)
    return d_a, d_b, i_a, i_b


def _chamfer_fwd(a, b, a_valid, b_valid):
    d_a, d_b, i_a, i_b = _chamfer_full(a, b, a_valid, b_valid)
    return (d_a, d_b), (a, b, a_valid, b_valid, i_a, i_b)


def _chamfer_bwd(res, g):
    """Gradient scatter through argmins (chamfer_distance.cpp:114-177):
    d(dist_a[i])/da[i] = 2 (a[i] - b[nn_a[i]]), and the cross terms
    accumulate -2 (b[j] - a[nn_b[j]]) into a[nn_b[j]]."""
    a, b, a_valid, b_valid, i_a, i_b = res
    g_a, g_b = g
    g_a = g_a * a_valid.astype(g_a.dtype)
    g_b = g_b * b_valid.astype(g_b.dtype)

    diff_a = a - b[i_a]          # [N, 3]
    diff_b = b - a[i_b]          # [M, 3]

    da = 2.0 * diff_a * g_a[:, None]
    da = da.at[i_b].add(-2.0 * diff_b * g_b[:, None])

    db = 2.0 * diff_b * g_b[:, None]
    db = db.at[i_a].add(-2.0 * diff_a * g_a[:, None])
    return da, db, None, None


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)
