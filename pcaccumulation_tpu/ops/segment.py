"""Fixed-capacity segment reductions.

TPU-native replacement for the reference's `torch_scatter.scatter(...,
reduce=max/mean/sum)` call sites (models/pillar_encoder.py:116-120,
motionnet.py:159-160, tpointnet.py:227-259, alignnet.py:133-134,
loss.py:216). All ops take a *static* `num_segments` so they jit-compile;
invalid rows are masked by routing them to an overflow segment that the
caller slices off, or by zero weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# Below this segment count a sum-reduction runs as a one-hot matmul on the
# MXU instead of a scatter: at [16384 rows, 129 segs] the scatter costs
# 80-220 us on v5e while the matmul is below measurement noise (<10 us,
# tools/profile_tpn_seg.py). FLOPs stay trivial (<= 2*N*256*C) and the
# VJP is another tiny matmul instead of a gather.
_DENSE_SEG_MAX = 256


def _dense_masked_segment_sum(data, segment_ids, valid, num_segments: int):
    """Segment sum as one-hot @ data. ids outside [0, num_segments) and
    invalid rows contribute nothing (their one-hot row is all zero)."""
    oh = segment_ids[:, None] == jnp.arange(num_segments, dtype=jnp.int32)[None]
    if valid is not None:
        oh = oh & valid.reshape(-1, 1)
    flat = data.reshape(data.shape[0], -1)
    if flat.dtype == jnp.float32:
        out = jax.lax.dot_general(
            oh.astype(flat.dtype), flat, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = jax.lax.dot_general(
            oh.astype(flat.dtype), flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(flat.dtype)
    return out.reshape((num_segments,) + data.shape[1:])


def segment_sum(data, segment_ids, num_segments: int):
    """data [N, ...] summed into [num_segments, ...]."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, eps: float = 1e-12):
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], data.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count, eps).reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments: int, fill_value: float = 0.0):
    """Max-reduce; empty segments get `fill_value` (torch_scatter uses 0 for
    float zeros tensor init — the reference relies on empty segments never
    being read, we make the fill explicit)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill_value)


def segment_min(data, segment_ids, num_segments: int, fill_value: float = 0.0):
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill_value)


def _segment_max_core(data, segment_ids, num_segments: int,
                      indices_are_sorted: bool):
    """segment_max with a winner-mask custom VJP.

    JAX's default segment_max backward costs ~2x the forward (trace:
    ~280 us extra per [16k, 256] -> 129 call); routing the cotangent by
    ``data == out[ids]`` is two contiguous row gathers + a compare, plus
    one winner-count scatter for the tie split (~100 us).

    TIE SEMANTICS (repo-wide contract): argmax ties EVEN-SPLIT the
    segment cotangent — each of k tied winners receives g/k. This is a
    valid max subgradient, identical to jax.ops.segment_max's default
    VJP and to kernels/segscan.py's scan VJP, so all three pool paths
    (this scatter core, the Pallas scan, and the raw XLA fallback) agree
    bitwise on tie gradients. (torch_scatter instead routes to a single
    arbitrary argmax; ties are measure-zero for continuous activations
    but NOT for bf16-quantized ones — ~3% of rows at bench shapes.)"""

    @jax.custom_vjp
    def seg_max(x, ids):
        return jax.ops.segment_max(x, ids, num_segments=num_segments,
                                   indices_are_sorted=indices_are_sorted)

    def fwd(x, ids):
        out = seg_max(x, ids)
        return out, (x, ids, out)

    def bwd(res, g):
        x, ids, out = res
        winner = x == jnp.take(out, ids, axis=0)
        if num_segments <= 2048 and x.shape[0] * num_segments <= 2 ** 25:
            # the tie-count is the bwd's only scatter; at small segment
            # counts a one-hot matmul beats it (the TPointNet alignment
            # pool's bwd traced 1.11 ms with the scatter vs the matmul's
            # trivial 2*N*S*C MXU FLOPs, PROFILE_r09). The N*S guard keeps
            # the one-hot materialisation under ~128 MB f32.
            nties = _dense_masked_segment_sum(
                winner.astype(jnp.float32), ids, None, num_segments)
        else:
            nties = jax.ops.segment_sum(
                winner.astype(jnp.float32), ids, num_segments=num_segments,
                indices_are_sorted=indices_are_sorted)
        share = g.astype(jnp.float32) / jnp.maximum(nties, 1.0)
        grad = jnp.where(winner, jnp.take(share, ids, axis=0), 0.0)
        return grad.astype(x.dtype), None

    seg_max.defvjp(fwd, bwd)
    return seg_max(data, segment_ids)


def masked_segment_max(data, segment_ids, valid, num_segments: int, fill_value: float = 0.0,
                       indices_are_sorted: bool = False):
    """Segment max where invalid rows contribute nothing.

    Set indices_are_sorted=True when segment_ids are non-decreasing (the
    data layer sorts points by pillar id — ~2x faster scatter on TPU)."""
    masked = jnp.where(valid.reshape((-1,) + (1,) * (data.ndim - 1)), data, _NEG_INF)
    out = _segment_max_core(masked, segment_ids, num_segments,
                            indices_are_sorted)
    return jnp.where(out <= _NEG_INF * 0.5, fill_value, out)


def masked_seg_pool_max(data, seg_ids, valid, num_segments: int,
                        fill_value: float = 0.0, rblk: int = 512):
    """Fused masked segment-max + gather-back over SORTED seg_ids.

    Semantically identical to
    `masked_segment_max(...)[seg_ids]` (the reference's scatter-max +
    gather local pooling, models/pillar_encoder.py:113-121), including
    the even-tie-split VJP. On TPU it runs as the two-pass Pallas
    segmented scan (kernels/segscan.py) — no scatter: the scatter-based
    pool's fwd+bwd measured 2.19 ms vs 0.74 ms for the scan at
    [60k, 32] bf16 on v5e. Elsewhere it falls back to the segment ops.
    """
    from pcaccumulation_tpu.kernels.segscan import seg_pool

    masked = jnp.where(valid.reshape((-1,) + (1,) * (data.ndim - 1)), data,
                       jnp.asarray(_NEG_INF, data.dtype))
    if jax.default_backend() == "tpu":
        y = seg_pool(masked, seg_ids, "max", rblk)
    else:
        y = jax.ops.segment_max(masked, seg_ids, num_segments=num_segments,
                                indices_are_sorted=True)[seg_ids]
    return jnp.where(y <= _NEG_INF * 0.5, jnp.asarray(fill_value, y.dtype), y)


def masked_segment_sum(data, segment_ids, valid, num_segments: int,
                       indices_are_sorted: bool = False):
    if num_segments <= _DENSE_SEG_MAX:
        return _dense_masked_segment_sum(data, segment_ids, valid, num_segments)
    masked = data * valid.reshape((-1,) + (1,) * (data.ndim - 1)).astype(data.dtype)
    return jax.ops.segment_sum(masked, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def masked_segment_mean(data, segment_ids, valid, num_segments: int, eps: float = 1e-12,
                        indices_are_sorted: bool = False):
    total = masked_segment_sum(data, segment_ids, valid, num_segments,
                               indices_are_sorted=indices_are_sorted)
    count = masked_segment_sum(
        valid.astype(data.dtype), segment_ids, valid, num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return total / jnp.maximum(count, eps).reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_count(segment_ids, valid, num_segments: int,
                  indices_are_sorted: bool = False):
    if num_segments <= _DENSE_SEG_MAX:
        return _dense_masked_segment_sum(
            valid.astype(jnp.float32), segment_ids, valid, num_segments
        )
    return jax.ops.segment_sum(
        valid.astype(jnp.float32), segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def compact_mask_indices(mask, s_cap: int):
    """Indices of a mask's True rows, compacted to a static capacity.

    mask [B, N] bool -> (sel [B, s_cap] int32, sel_valid [B, s_cap] bool).
    Stable partition via two cumsums: selected indices first (ascending),
    then unselected filler, truncated at s_cap. Replaces top_k-based
    selection (top_k sorts the whole row: ~0.4 ms at N=60k on v5e vs ~50 us
    for cumsum + one unique scatter). The result rows are a prefix of a
    permutation of arange(N), hence DISTINCT — safe for
    `take_rows_unique`'s unique-index scatter-add VJP.

    If the mask has more than s_cap True rows, the overflow rows are NOT
    selected (same truncation the top_k path had).
    """
    b, n = mask.shape
    mask_i = mask.astype(jnp.int32)
    sel_cum = jnp.cumsum(mask_i, axis=1)  # [B, N] 1-based rank among selected
    count = sel_cum[:, -1:]  # [B, 1]
    idx = jnp.arange(n, dtype=jnp.int32)[None]  # [1, N]
    unsel_rank = (idx + 1) - sel_cum  # 1-based rank among unselected
    dest = jnp.where(mask, sel_cum - 1, count + unsel_rank - 1)  # permutation

    def invert(d):
        out = jnp.zeros((s_cap,), jnp.int32)
        dd = jnp.where(d < s_cap, d, s_cap)
        return out.at[dd].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
        )

    sel = jax.vmap(invert)(dest)
    sel_valid = idx[:, :s_cap] < count
    return sel, sel_valid


def take_rows_unique(arr, idx):
    """Batched row gather whose VJP is a unique-index scatter-add.

    arr [B, N, ...], idx [B, S] int with DISTINCT values per row (e.g.
    top_k output — top_k always returns distinct positions). The default
    take_along_axis backward emits a generic scatter-add; declaring the
    indices unique unlocks XLA's fast scatter path on TPU (the same
    effect measured 35x on the BEV canvas scatter)."""
    shape, dtype = arr.shape, arr.dtype
    expand = (slice(None),) * 2 + (None,) * (arr.ndim - 2)

    @jax.custom_vjp
    def gather(a, ix):
        return jnp.take_along_axis(a, ix[expand], axis=1)

    def fwd(a, ix):
        return gather(a, ix), ix

    def bwd(ix, g):
        zeros = jnp.zeros(shape, dtype)

        def one(z, i, gg):
            return z.at[i].add(gg, mode="drop", unique_indices=True)

        return jax.vmap(one)(zeros, ix, g.astype(dtype)), None

    gather.defvjp(fwd, bwd)
    return gather(arr, idx)
