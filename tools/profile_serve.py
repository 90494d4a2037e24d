"""End-to-end serving throughput of `serve.Predictor` on the chip.

The bench/profile harnesses time the DEVICE graph (chained fori_loop —
tools/profile_nuscene.py); serving adds host preprocessing (crop /
ground / voxelize via the native hash), H2D/D2H transfer and host
post-processing (trim + flow). This harness measures that full path:

  1. host prep per scan (`Predictor._prep`, single core)
  2. sequential `predict` latency (prep + device + postproc, no overlap)
  3. `predict_stream` throughput (producer-thread overlap, prefetch=2)

through the production nuScenes preset (T=11, N=120k). Weights are
random-init — throughput does not depend on their values.

Caveat: this host reaches the chip via a network tunnel, so each
dispatch carries tunnel latency a colocated production host would not
pay; the stream number is therefore a LOWER bound on colocated serving
throughput (the overlap hides part of it, which is the point).

With --export, additionally round-trips `Predictor.export` ->
`ExportedPredictor` and times the sequential predict through the
deserialized StableHLO artifact (the deployment path).

Run: python tools/profile_serve.py [--band=4] [--preset=nuscene|waymo]
                                   [--scans=12] [--export]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from pcaccumulation_tpu.data.synthetic import generate_sample
from pcaccumulation_tpu.serve import Predictor
from tools.profile_nuscene import waymo_cfg
from tools.trace_forward import nuscene_cfg


def make_scans(cfg, n_distinct=6):
    t = cfg["voxel_generator"]["n_sweeps"]
    scans = []
    for i in range(n_distinct):
        d = generate_sample(seed=100 + i, n_frames=t, freq=20.0,
                            n_static_clusters=40, n_dynamic=6,
                            pts_per_cluster=900, pts_per_object=400,
                            area=30.0)
        scans.append((d["raw_points"], d["time_indice"]))
    return scans


def main():
    band, preset, n_stream = 4, "nuscene", 12
    do_export = "--export" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--band="):
            band = int(a.split("=", 1)[1])
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
        if a.startswith("--scans="):
            n_stream = int(a.split("=", 1)[1])

    cfg = waymo_cfg() if preset == "waymo" else nuscene_cfg()
    cfg["stpn"]["n_band_layers"] = band

    t0 = time.perf_counter()
    pred = Predictor(cfg)  # random init; compiles the test-mode step
    scans = make_scans(cfg)
    # warm: first predict pays compile
    pred.predict(*scans[0])
    print(f"init+compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)

    # 1. host prep alone
    t0 = time.perf_counter()
    for s in scans:
        pred._prep(*s)
    prep_ms = (time.perf_counter() - t0) / len(scans) * 1e3

    # 1b. decomposition: H2D, device test-mode step, D2H fetch (each
    # timed as serving performs it — per-dispatch, tunnel latency and
    # all; the chained-loop device floor is profile_nuscene's job).
    # CAVEAT: through the async axon tunnel, block_until_ready does not
    # faithfully await transfer completion, so these per-leg numbers are
    # indicative only — micro-benchmarks show size-independent anomalies.
    # Trust the end-to-end walls (sequential / stream) below.
    import jax.numpy as jnp

    batches = [pred._prep(*s) for s in scans]
    t0 = time.perf_counter()
    jbs = [jax.block_until_ready(jax.tree.map(jnp.asarray, b))
           for b in batches]
    h2d_ms = (time.perf_counter() - t0) / len(batches) * 1e3
    for jb in jbs[:2]:  # warm
        jax.block_until_ready(pred._invoke(jb))
    t0 = time.perf_counter()
    outs = [jax.block_until_ready(pred._invoke(jb)) for jb in jbs]
    dev_ms = (time.perf_counter() - t0) / len(jbs) * 1e3
    t0 = time.perf_counter()
    fetched = [jax.device_get(o) for o in outs]
    d2h_ms = (time.perf_counter() - t0) / len(outs) * 1e3
    del jbs, outs, fetched

    # 2. sequential predict latency
    for s in scans[:2]:
        pred.predict(*s)  # warm any remaining caches
    t0 = time.perf_counter()
    for i in range(n_stream):
        pred.predict(*scans[i % len(scans)])
    seq_ms = (time.perf_counter() - t0) / n_stream * 1e3

    # 3. streaming (producer-thread prep overlap)
    stream_in = [scans[i % len(scans)] for i in range(n_stream)]
    t0 = time.perf_counter()
    n_out = sum(1 for _ in pred.predict_stream(iter(stream_in)))
    stream_ms = (time.perf_counter() - t0) / n_out * 1e3
    assert n_out == n_stream

    t = cfg["voxel_generator"]["n_sweeps"]
    print(f"{preset} T={t} band={band} serving (n={n_stream}):")
    print(f"  host prep          : {prep_ms:8.2f} ms/seq")
    print(f"  H2D transfer       : {h2d_ms:8.2f} ms/seq")
    print(f"  device step        : {dev_ms:8.2f} ms/seq (per-dispatch)")
    print(f"  D2H fetch          : {d2h_ms:8.2f} ms/seq")
    print(f"  sequential predict : {seq_ms:8.2f} ms/seq "
          f"({1e3 / seq_ms:.2f} seq/s)")
    print(f"  predict_stream     : {stream_ms:8.2f} ms/seq "
          f"({1e3 / stream_ms:.2f} seq/s)")

    if do_export:
        import os
        import tempfile

        from pcaccumulation_tpu.serve import ExportedPredictor

        path = os.path.join(tempfile.mkdtemp(), "model.pcx.npz")
        t0 = time.perf_counter()
        pred.export(path)
        export_s = time.perf_counter() - t0
        served = ExportedPredictor(path)
        served.predict(*scans[0])  # warm
        t0 = time.perf_counter()
        for i in range(n_stream):
            served.predict(*scans[i % len(scans)])
        aot_ms = (time.perf_counter() - t0) / n_stream * 1e3
        size_mb = os.path.getsize(path) / 1e6
        print(f"  exported artifact  : {size_mb:.1f} MB, export {export_s:.1f}s")
        print(f"  ExportedPredictor  : {aot_ms:8.2f} ms/seq "
              f"({1e3 / aot_ms:.2f} seq/s)")


if __name__ == "__main__":
    main()
