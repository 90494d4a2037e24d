"""Sorted-segment scan kernels: scatter-free pillar pooling.

The data layer sorts points by pillar id (ids non-decreasing), so every
`torch_scatter.scatter(..., reduce=max)` + gather-back pair in the
reference's PillarFeatureNet local pooling (reference
models/pillar_encoder.py:113-121) is a *segmented reduce-broadcast over a
sorted key array* — computable with two linear scans and ZERO scatters.
XLA lowers sorted segment_max to a row-serial scatter on TPU (~0.47 ms
per [60k, 32] pool on v5e); these kernels do the same reduction in two
sequential-grid Pallas passes whose HBM traffic is just 2 reads + 1
write of the operand each:

  pass 1 (forward):  p[i] = reduce over j <= i with ids[j] == ids[i]
  pass 2 (reverse):  s[i] = reduce over j >= i with ids[j] == ids[i],
                     fused with the cross-direction combine
                     (max: max(p, s);  sum: p + s - x).

Within a block the scan is a log-step Hillis-Steele over sublanes
(`pltpu.roll`); across blocks a (segment-id, value-row) carry lives in
scratch — the TPU grid executes sequentially, so the carry is exact for
ANY run length (no max-points-per-pillar cap, matching the reference's
uncapped dynamic voxelization).

The custom VJPs are scans too:
  max: grad_x = (x == y) * seg_pool(g, 'sum') / tie_count — EVEN-SPLIT
       among argmax ties, the repo-wide tie contract shared with
       jax.ops.segment_max's default VJP and ops/segment.py's
       winner-mask core (see _segment_max_core).
  sum: grad_x = seg_pool(g, 'sum').

Block width (the channel dim, <=128 lanes) obeys the Mosaic lane limit
recorded for this repo: 32-lane pools lower fine; wider operands must be
chunked by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # matches ops/segment.py masking sentinel


def _identity(op: str, dtype):
    return jnp.asarray(_NEG_INF if op == "max" else 0.0, dtype)


def _combine(op: str, a, b):
    return jnp.maximum(a, b) if op == "max" else a + b


def _scan_block_kernel(x_ref, id_ref, o_ref, cval_ref, cid_ref, *,
                       op: str, rblk: int, reverse: bool):
    """One directional segmented-scan pass over row blocks.

    x_ref  [R, C]  operand block (VMEM)
    id_ref [R, 1]  sorted segment ids (VMEM, int32)
    o_ref  [R, C]  inclusive directional scan of the block
    cval_ref [8, C] f32 scratch — row 0 carries the running reduce
    cid_ref  [1, 1] i32 scratch — segment id the carry belongs to
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cid_ref[0, 0] = jnp.int32(-1)  # ids are >= 0: never matches
        cval_ref[:, :] = jnp.full_like(cval_ref[:, :], _identity(op, jnp.float32))

    x = x_ref[:].astype(jnp.float32)
    ids = id_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (rblk, 1), 0)

    # in-block Hillis-Steele: after step s, x[i] reduces rows within
    # distance < 2s in the scan direction (sorted ids make the single
    # neighbour-id equality check sufficient)
    s = 1
    while s < rblk:
        if not reverse:
            nx = pltpu.roll(x, s, axis=0)
            nid = pltpu.roll(ids, s, axis=0)
            ok = (row >= s) & (nid == ids)
        else:
            nx = pltpu.roll(x, rblk - s, axis=0)
            nid = pltpu.roll(ids, rblk - s, axis=0)
            ok = (row < rblk - s) & (nid == ids)
        x = jnp.where(ok, _combine(op, x, nx), x)
        s *= 2

    # fold in the carry from the previous block (same segment only).
    # Applied AFTER the in-block scan: for `sum`, applying before would
    # double-count the carry through the prefix accumulation.
    boundary = 0 if reverse else rblk - 1
    match = ids == cid_ref[0, 0]
    x = jnp.where(match, _combine(op, x, cval_ref[0:1, :]), x)

    o_ref[:] = x.astype(o_ref.dtype)
    cval_ref[0:1, :] = x[boundary:boundary + 1, :]
    cid_ref[0, 0] = ids[boundary, 0]


def _total_block_kernel(x_ref, id_ref, pre_ref, o_ref, cval_ref, cid_ref, *,
                        op: str, rblk: int):
    """Reverse pass fused with the two-direction combine: emits the full
    per-row segment reduction given the forward pass `pre`."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cid_ref[0, 0] = jnp.int32(-1)
        cval_ref[:, :] = jnp.full_like(cval_ref[:, :], _identity(op, jnp.float32))

    x = x_ref[:].astype(jnp.float32)
    ids = id_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (rblk, 1), 0)

    suf = x
    s = 1
    while s < rblk:
        nx = pltpu.roll(suf, rblk - s, axis=0)
        nid = pltpu.roll(ids, rblk - s, axis=0)
        ok = (row < rblk - s) & (nid == ids)
        suf = jnp.where(ok, _combine(op, suf, nx), suf)
        s *= 2

    match = ids == cid_ref[0, 0]
    suf = jnp.where(match, _combine(op, suf, cval_ref[0:1, :]), suf)

    pre = pre_ref[:].astype(jnp.float32)
    if op == "max":
        total = jnp.maximum(pre, suf)
    else:
        total = pre + suf - x  # both inclusive scans count x once each

    o_ref[:] = total.astype(o_ref.dtype)
    cval_ref[0:1, :] = suf[0:1, :]
    cid_ref[0, 0] = ids[0, 0]


def _pad_rows(x, rblk, fill):
    n = x.shape[0]
    npad = (-n) % rblk
    if npad:
        x = jnp.pad(x, ((0, npad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
    return x


@functools.partial(jax.jit, static_argnames=("op", "rblk", "interpret"))
def _seg_pool_impl(x, ids, *, op: str, rblk: int, interpret: bool):
    n, c = x.shape
    xp = _pad_rows(x, rblk, 0)
    # pad rows get their own out-of-band segment (ids are < 2**30)
    idp = _pad_rows(ids.astype(jnp.int32)[:, None], rblk, jnp.int32(2**30))
    nb = xp.shape[0] // rblk

    scratch = [
        pltpu.VMEM((8, c), jnp.float32),
        pltpu.SMEM((1, 1), jnp.int32),
    ]
    pre = pl.pallas_call(
        functools.partial(_scan_block_kernel, op=op, rblk=rblk, reverse=False),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rblk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, idp)

    rev = lambda i: (nb - 1 - i, 0)  # noqa: E731 — reverse-order grid walk
    total = pl.pallas_call(
        functools.partial(_total_block_kernel, op=op, rblk=rblk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rblk, c), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, c), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblk, c), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, idp, pre)
    return total[:n]


def seg_pool_ref(x, ids, op: str):
    """jnp reference: per-row broadcast of the row's segment reduction.

    Test helper — requires concrete ids (sizes the segment table from
    their max)."""
    num = int(jax.device_get(ids).max()) + 1
    if op == "max":
        red = jax.ops.segment_max(x, ids, num_segments=num)
    else:
        red = jax.ops.segment_sum(x, ids, num_segments=num)
    return red[ids]


def _seg_pool_raw(x, ids, op: str, rblk: int, interpret: bool | None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # non-TPU path: pure-XLA log-shift scans (the ids' max value is
        # not static here, so the segment-op form is not usable directly)
        return _seg_pool_jnp(x, ids, op)
    return _seg_pool_impl(x, ids, op=op, rblk=rblk, interpret=False)


def _seg_pool_jnp(x, ids, op: str):
    """Pure-XLA log-shift fallback (CPU tests / non-TPU backends)."""
    n = x.shape[0]
    ident = _identity(op, x.dtype)

    def shift_fwd(a, s, fill):
        return jnp.concatenate([jnp.full((s,) + a.shape[1:], fill, a.dtype),
                                a[:-s]], axis=0)

    def shift_rev(a, s, fill):
        return jnp.concatenate([a[s:],
                                jnp.full((s,) + a.shape[1:], fill, a.dtype)],
                               axis=0)

    def scan(direction):
        shift = shift_fwd if direction == "fwd" else shift_rev
        acc = x
        s = 1
        while s < n:
            nid = shift(ids[:, None], s, jnp.int32(-1) if direction == "fwd"
                        else jnp.int32(-2))
            nx = shift(acc, s, ident)
            ok = nid == ids[:, None]
            acc = jnp.where(ok, _combine(op, acc, nx), acc)
            s *= 2
        return acc

    pre, suf = scan("fwd"), scan("rev")
    if op == "max":
        return jnp.maximum(pre, suf)
    return pre + suf - x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def seg_pool(x, ids, op: str = "max", rblk: int = 1024,
             interpret: bool | None = None):
    """Per-row segment reduce-broadcast over SORTED ids.

    x [N, C] float, ids [N] int32 non-decreasing. Returns [N, C] where
    row i holds op-reduce over all rows sharing ids[i]. Equivalent to
    `segment_op(x, ids)[ids]` with no scatter (TPU) — the fused form of
    the reference's scatter+gather local pooling
    (models/pillar_encoder.py:113-121).
    """
    return _seg_pool_raw(x, ids, op, rblk, interpret)


def _seg_pool_fwd(x, ids, op, rblk, interpret):
    y = _seg_pool_raw(x, ids, op, rblk, interpret)
    res = (x, ids, y) if op == "max" else (ids,)
    return y, res


def _seg_pool_bwd(op, rblk, interpret, res, g):
    if op == "max":
        # Even-split among argmax ties — the same routing as jax's
        # segment_max VJP, so swapping this kernel in changes no
        # gradients. (bf16 activations DO tie: ~2.6% of rows at bench
        # shapes.) The cotangent sum and the tie count ride ONE fused
        # sum-scan over [N, 2C].
        x, ids, y = res
        c = x.shape[1]
        tie = x == y
        packed = jnp.concatenate(
            [g.astype(jnp.float32), tie.astype(jnp.float32)], axis=-1)
        ps = _seg_pool_raw(packed, ids, "sum", rblk, interpret)
        gs, nt = ps[:, :c], ps[:, c:]
        grad = jnp.where(tie, (gs / jnp.maximum(nt, 1.0)).astype(x.dtype),
                         jnp.zeros_like(x))
    else:
        (ids,) = res
        grad = _seg_pool_raw(g, ids, "sum", rblk, interpret)
    return grad, None


seg_pool.defvjp(_seg_pool_fwd, _seg_pool_bwd)
