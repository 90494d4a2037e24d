"""Measure int8 vs bf16 vs f32 conv/matmul throughput on the real chip.

Decides whether an int8 post-training-quantized inference path is worth
building: v5e's MXU peak is 394 TOPS int8 vs 197 TFLOPS bf16, but the
win only materialises if XLA lowers `lax.conv_general_dilated` with int8
operands (preferred_element_type=int32) onto the MXU at that rate.

Timing: chained fori_loop differencing (the axon tunnel's
block_until_ready does not pin per-dispatch completion). Each loop
iteration feeds the conv's FULL output back as the next input through a
requantize epilogue (clip/scale/cast) — this both defeats XLA's DCE of
unconsumed output elements (a carry that reads one element lets XLA
slice the conv to a single output pixel) and measures the epilogue a
real quantized layer pays anyway. Shapes use ci == co so the output
chains; they bracket the production conv stack (T=11, 288^2 UNet ladder
levels + the STPN band conv).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def time_chained(step, args, n1=20, n2=220, repeats=3):
    # warm both trip counts first (compilation would land inside n1)
    float(step(*args, jnp.int32(n1)))
    float(step(*args, jnp.int32(n2)))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(step(*args, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(step(*args, jnp.int32(n2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if best is None or dt < best:
            best = dt
    return best / (n2 - n1)


def conv(x, w, acc_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def chained_conv_step(x, w, n, acc_dtype, requant):
    def body(_, xx):
        return requant(conv(xx, w, acc_dtype)).astype(x.dtype)

    out = lax.fori_loop(0, n, body, x)
    return out.astype(jnp.float32).reshape(-1)[0]


def requant_f(out):  # float path: scale (the BN/ReLU epilogue analogue)
    return nn_relu_scale(out)


def nn_relu_scale(out):
    return (jnp.maximum(out, 0) * 0.05).astype(out.dtype)


def requant_i8(out):  # int32 accum -> int8: shift-scale + clip + cast
    return jnp.clip(out >> 6, -127, 127).astype(jnp.int8)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)
    # ci == co so the output chains back as input
    shapes = [
        ("l0_288_c32", 11, 288, 288, 32),
        ("l1_144_c64", 11, 144, 144, 64),
        ("l2_72_c128", 11, 72, 72, 128),
        ("l3_36_c256", 11, 36, 36, 256),
        ("l4_18_c512", 11, 18, 18, 512),
        ("band_288_c352", 1, 288, 288, 352),
        ("s2d_144_c128", 11, 144, 144, 128),
    ]
    print(f"{'shape':14s} {'f32 ms':>8s} {'bf16 ms':>8s} {'int8 ms':>8s} "
          f"{'bf16 TF/s':>9s} {'int8 TOP/s':>10s} {'i8/bf16':>8s}")
    for name, n, h, w_, c in shapes:
        x = rng.standard_normal((n, h, w_, c)).astype(np.float32)
        w = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
        flops = 2 * n * h * w_ * c * c * 9

        xj, wj = jnp.asarray(x), jnp.asarray(w)
        xb, wb = xj.astype(jnp.bfloat16), wj.astype(jnp.bfloat16)
        xi = jnp.asarray(np.clip(np.round(x * 20), -127, 127).astype(np.int8))
        wi = jnp.asarray(np.clip(np.round(w * 600), -127, 127).astype(np.int8))

        t32 = time_chained(jax.jit(partial(
            chained_conv_step, acc_dtype=jnp.float32, requant=requant_f)),
            (xj, wj))
        t16 = time_chained(jax.jit(partial(
            chained_conv_step, acc_dtype=jnp.float32, requant=requant_f)),
            (xb, wb))
        try:
            t8 = time_chained(jax.jit(partial(
                chained_conv_step, acc_dtype=jnp.int32, requant=requant_i8)),
                (xi, wi))
        except Exception as e:
            print("  int8 failed:", type(e).__name__, str(e)[:150])
            t8 = float("nan")
        print(f"{name:14s} {t32*1e3:8.3f} {t16*1e3:8.3f} {t8*1e3:8.3f} "
              f"{flops/t16/1e12:9.1f} {flops/t8/1e12:10.1f} {t16/t8:8.2f}")

    def chained_dot_step(a, b, n, acc_dtype, requant):
        def body(_, aa):
            return requant(
                lax.dot(aa, b, preferred_element_type=acc_dtype)
            ).astype(a.dtype)

        out = lax.fori_loop(0, n, body, a)
        return out.astype(jnp.float32).reshape(-1)[0]

    m = 4096
    a8 = jnp.asarray(rng.integers(-8, 8, (m, m)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-8, 8, (m, m)).astype(np.int8))
    ab = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    t16 = time_chained(jax.jit(partial(
        chained_dot_step, acc_dtype=jnp.float32, requant=requant_f)), (ab, bb))
    t8 = time_chained(jax.jit(partial(
        chained_dot_step, acc_dtype=jnp.int32, requant=requant_i8)), (a8, b8))
    fl = 2 * m * m * m
    print(f"matmul 4096^3: bf16 {t16*1e3:.3f} ms ({fl/t16/1e12:.0f} TF/s)  "
          f"int8 {t8*1e3:.3f} ms ({fl/t8/1e12:.0f} TOP/s)  "
          f"ratio {t16/t8:.2f}")


if __name__ == "__main__":
    main()
