"""Space-to-depth conv reformulation: parity + microbenchmark.

The round-2/3 profiles pinned the val forward on an XLA conv-emitter
floor at 32-64 channels (tools/PROFILE_r03.md "Current attribution"):
narrow-channel convs at 288^2 run ~5-12 TF/s because the channel dims
cannot fill the 128x128 MXU. Space-to-depth (s2d) is the classic TPU
fix that was never measured here: a 3x3 SAME conv on [H, W, C] is
EXACTLY a 3x3 SAME conv on the s2d tensor [H/2, W/2, 4C] with a derived
kernel (4x the FLOPs, structurally zero taps included), and

  - 2x2/2 max-pool  == a per-channel max over the 4 s2d sub-positions,
  - 2x2/2 transpose-conv == a 1x1 conv in s2d space.

So an entire UNet level can run in s2d space with 128-wide channels.
This script (a) checks the kernel transform is exact on the chip and
(b) measures whether 4x FLOPs at 4x channel width beats the narrow conv.

Run: python tools/profile_s2d.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def conv3x3(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=DN)


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def s2d_kernel(k):
    """Derive the [3,3,4C,4Co] s2d-space kernel from a [3,3,C,Co] kernel.

    Sub-position index within a block is (r, s) with channel layout
    (r*2+s)*C + c, matching space_to_depth above.  For output
    sub-position (oi, oj) and block offset (u, v) in {-1,0,1}, the
    original tap is dp = 2u + ri - oi + 1 (valid when 0<=dp<=2).
    """
    c, co = k.shape[2], k.shape[3]
    out = np.zeros((3, 3, 4 * c, 4 * co), k.dtype)
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            for ri in (0, 1):
                for rj in (0, 1):
                    for oi in (0, 1):
                        for oj in (0, 1):
                            dp = 2 * u + ri - oi + 1
                            dq = 2 * v + rj - oj + 1
                            if 0 <= dp <= 2 and 0 <= dq <= 2:
                                ii = (ri * 2 + rj) * c
                                oo = (oi * 2 + oj) * co
                                out[u + 1, v + 1, ii:ii + c, oo:oo + co] = \
                                    k[dp, dq]
    return out


def time_fn(fn, args, n1=20, n2=120):
    def many(n, *a):
        def body(i, acc):
            pert = a[0] + (i * jnp.float32(1e-12)).astype(a[0].dtype)
            out = fn(pert, *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    many_jit = jax.jit(many)
    float(many_jit(jnp.int32(n1), *args))
    float(many_jit(jnp.int32(n2), *args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many_jit(jnp.int32(n1), *args))
        t1 = time.perf_counter()
        float(many_jit(jnp.int32(n2), *args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def parity():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
    k = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 5)))
    ref = conv3x3(x, jnp.asarray(k))
    got = depth_to_space(conv3x3(space_to_depth(x), jnp.asarray(s2d_kernel(k))))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"parity max|err| = {err:.2e}")
    assert err < 1e-4

    # pool equivalence: 2x2/2 max pool == group-max over sub-positions
    y = jax.random.normal(key, (2, 16, 16, 8))
    pool = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")
    ys = space_to_depth(y)
    b, h, w, _ = ys.shape
    gmax = ys.reshape(b, h, w, 4, 8).max(axis=3)
    assert float(jnp.max(jnp.abs(pool - gmax))) < 1e-6
    print("pool-as-group-max parity ok")


def bench():
    bt = 4  # B*T at bench shapes
    for C in (32, 64):
        for dt in (jnp.bfloat16,):
            x = jax.random.normal(jax.random.PRNGKey(0),
                                  (bt, 288, 288, C)).astype(dt)
            k = jax.random.normal(jax.random.PRNGKey(1),
                                  (3, 3, C, C)).astype(dt)
            t_narrow = time_fn(conv3x3, (x, k))
            xs = space_to_depth(x)
            ks = jax.random.normal(jax.random.PRNGKey(2),
                                   (3, 3, 4 * C, 4 * C)).astype(dt)
            t_wide = time_fn(conv3x3, (xs, ks))

            # fused: s2d once + two convs + group-max pool, vs narrow ditto
            def narrow_block(x, k):
                h = jax.nn.relu(conv3x3(x, k))
                h = jax.nn.relu(conv3x3(h, k))
                return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                             (1, 2, 2, 1), (1, 2, 2, 1),
                                             "VALID")

            def s2d_block(x, ks):
                h = space_to_depth(x)
                h = jax.nn.relu(conv3x3(h, ks))
                h = jax.nn.relu(conv3x3(h, ks))
                b, hh, ww, _ = h.shape
                return h.reshape(b, hh, ww, 4, C).max(axis=3)

            t_nb = time_fn(narrow_block, (x, k))
            t_sb = time_fn(s2d_block, (x, ks))
            gf = 2 * 9 * C * C * 288 * 288 * bt / 1e9
            print(f"C={C:3d} {np.dtype(dt).name}: narrow {t_narrow*1e3:6.3f} ms"
                  f" ({gf/t_narrow/1e3:5.1f} TF/s)   s2d-equiv "
                  f"{t_wide*1e3:6.3f} ms ({4*gf/t_wide/1e3:5.1f} TF/s)"
                  f"   ratio {t_wide/t_narrow:4.2f}")
            print(f"      level-0 block (2 convs+pool): narrow {t_nb*1e3:6.3f}"
                  f" ms   s2d {t_sb*1e3:6.3f} ms   ratio {t_sb/t_nb:4.2f}")


if __name__ == "__main__":
    print(jax.devices())
    parity()
    bench()
