"""Hardware tests: Pallas kernels vs jnp references on the real TPU chip.

Run manually (outside the CPU-forced main suite):
    python -m pytest tests/tpu -q -p no:cacheprovider --confcutdir=tests/tpu
or simply `python tests/tpu/test_pallas_tpu.py`.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def run():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    from pcaccumulation_tpu.kernels.chamfer import nn_bruteforce_ref, nn_pallas

    rng = np.random.default_rng(0)
    for n, m in ((1000, 2000), (5000, 4096), (300, 70000)):
        a = (rng.normal(size=(n, 3)) * 10).astype(np.float32)
        b = (rng.normal(size=(m, 3)) * 10).astype(np.float32)
        valid = rng.random(m) > 0.1

        d_ref, i_ref = nn_bruteforce_ref(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))
        d_pal, i_pal = nn_pallas(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))

        np.testing.assert_allclose(
            np.asarray(d_pal), np.asarray(d_ref), rtol=1e-3, atol=1e-3
        )
        # argmins may differ on exact ties; distances at the chosen index
        # must match the min
        d_at = ((a - np.asarray(b)[np.asarray(i_pal)]) ** 2).sum(-1)
        np.testing.assert_allclose(d_at, np.asarray(d_ref), rtol=1e-3, atol=1e-3)
        print(f"nn_pallas parity OK for N={n}, M={m}")


def run_row_shift():
    """Row-shift kernels must COMPILE on real Mosaic and match the XLA
    reference at every production shape — interpret-mode CPU tests can't
    catch Mosaic lowering failures (a T=5 canvas failed to compile in
    round 3: scratches over 128 lanes are not lowerable, see
    tools/PROFILE_r03.md)."""
    import jax.numpy as jnp

    from pcaccumulation_tpu.ops.bilinear import (
        _row_shift_blocks_xla,
        row_shift_blocks,
    )

    rng = np.random.default_rng(1)
    # (rows, width, per-frame channels, frames): bench T=4, Waymo T=5,
    # nuScenes T=11; both f32 and the production bf16
    for r, w, c, nb, dtype in (
        (288, 288, 32, 4, np.float32),
        (290, 290, 32, 5, np.float32),
        (288, 288, 32, 11, np.float32),
        (288, 288, 32, 5, "bfloat16"),
    ):
        img_np = rng.normal(size=(r, w, nb * c)).astype(np.float32)
        shifts_np = ((rng.random((r, nb)) - 0.5) * 2.5 * w).astype(np.float32)
        img = jnp.asarray(img_np).astype(dtype)
        shifts = jnp.asarray(shifts_np)
        out = np.asarray(row_shift_blocks(img, shifts, nb)).astype(np.float32)
        k = np.floor(shifts_np)
        ref = np.asarray(_row_shift_blocks_xla(
            jnp.asarray(img_np).astype(dtype),
            jnp.asarray(np.clip(k.astype(np.int32), -w, w)),
            jnp.asarray((shifts_np - k).astype(np.float32)).astype(dtype),
            nb,
        )).astype(np.float32)
        # bf16: the pallas kernel lerps in its f32 scratch, the XLA
        # reference lerps in bf16 — one-ulp rounding differences remain
        tol = 1e-5 if dtype is np.float32 else 5e-2
        np.testing.assert_allclose(out, ref, atol=tol)
        print(f"row_shift_blocks parity OK for R={r} W={w} T={nb} {dtype}")


def run_segscan():
    """Segmented-scan pooling: real-Mosaic compile + parity + grad parity
    at every production point count (bench 60k, Waymo 90k, nuScenes 120k;
    batch-flattened ids, bf16 and f32)."""
    import jax
    import jax.numpy as jnp

    from pcaccumulation_tpu.kernels.segscan import _seg_pool_impl, seg_pool_ref
    from pcaccumulation_tpu.ops.segment import (
        masked_seg_pool_max,
        masked_segment_max,
    )

    rng = np.random.default_rng(2)
    for n, m, c, dtype in (
        (60000, 25000, 32, "bfloat16"),
        (90000, 30000, 32, "bfloat16"),
        (120000, 40000, 32, "bfloat16"),
        (60000, 25000, 9, np.float32),
    ):
        ids = np.sort(rng.integers(0, m, size=n)).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32).astype(dtype)
        for op in ("max", "sum"):
            out = _seg_pool_impl(x, jnp.asarray(ids), op=op, rblk=512,
                                 interpret=False).astype(jnp.float32)
            ref = seg_pool_ref(x.astype(jnp.float32), jnp.asarray(ids), op)
            tol = 1e-5 if dtype is np.float32 else 2e-2
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=tol, atol=tol)

        # gradient parity vs the scatter path (bf16 values tie -> the
        # even-split VJP must match jax's segment_max routing)
        valid = jnp.asarray(rng.random(n) < 0.97)
        xq = x.astype(jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

        def old(xx, ids=ids, valid=valid, m=m):
            p = masked_segment_max(xx, jnp.asarray(ids), valid, m + 1,
                                   indices_are_sorted=True)
            return p[jnp.asarray(ids)]

        def new(xx, ids=ids, valid=valid, m=m):
            return masked_seg_pool_max(xx, jnp.asarray(ids), valid, m + 1)

        np.testing.assert_allclose(np.asarray(new(xq)), np.asarray(old(xq)),
                                   rtol=1e-6, atol=1e-6)
        g_old = jax.vjp(old, xq)[1](g)[0]
        g_new = jax.vjp(new, xq)[1](g)[0]
        np.testing.assert_allclose(np.asarray(g_old), np.asarray(g_new),
                                   rtol=1e-4, atol=1e-4)
        print(f"segscan parity OK for N={n} M={m} C={c} {dtype}")


if __name__ == "__main__":
    run()
    run_row_shift()
    run_segscan()
    print("ALL TPU KERNEL TESTS PASSED")
