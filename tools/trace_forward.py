"""Capture a device trace of the bench val forward and attribute op time.

Writes /tmp/fwd_hlo.txt (compiled HLO) and prints a per-source-line cost
table joined from the xplane trace. Uses the persistent compilation cache
so repeated profiling runs skip the ~5-10 min XLA compile.

Run: python tools/trace_forward.py [batch_size] [--train|--test] [--nuscene]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import bench_cfg, make_batch
from pcaccumulation_tpu.models import MotionNet


def nuscene_cfg():
    from pcaccumulation_tpu.config import derive, load_config

    cfg = load_config("configs/nuscene.yaml")
    cfg["capacity"] = {"max_points": 120000, "max_pillars": 40000,
                       "max_instances": 48, "max_fg_points": 16384}
    cfg["precision"]["compute_dtype"] = "bfloat16"
    cfg["cluster"]["max_cluster_points"] = 8192
    return derive(cfg)


def nuscene_batch(cfg):
    from pcaccumulation_tpu.data.dataset import prep_sample
    from pcaccumulation_tpu.data.loader import collate
    from pcaccumulation_tpu.data.synthetic import generate_sample

    t = cfg["voxel_generator"]["n_sweeps"]
    data = generate_sample(seed=0, n_frames=t, freq=20.0,
                           n_static_clusters=40, n_dynamic=6,
                           pts_per_cluster=900, pts_per_object=400, area=30.0)
    return collate([prep_sample(data, cfg, augment=False)])


def capture(batch_size: int = 1, train: bool = False, preset: str = "bench",
            perf: dict | None = None, mode: str = "val"):
    if preset == "nuscene":
        cfg = nuscene_cfg()
        batch = nuscene_batch(cfg)
    else:
        cfg = bench_cfg(batch_size)
        batch = make_batch(cfg, batch_size)
    if perf:
        cfg.setdefault("perf", {}).update(perf)
    jbatch = jax.tree.map(jnp.asarray, batch)
    model = MotionNet(cfg)
    init_fn = jax.jit(lambda rngs, b: model.init(rngs, b, train=False, mode="val"))
    variables = init_fn(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, jbatch
    )
    if train:
        from pcaccumulation_tpu.train.loss import fuse_loss

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        loss_w = cfg["loss"]
        max_inst = cfg["capacity"]["max_instances"]

        def loss_fn(p, bs, b):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, b, train=True, mode="train",
                rngs={"sample": jax.random.key(7)}, mutable=["batch_stats"],
            )
            stats = fuse_loss(out, b, loss_w, max_inst)
            return stats["loss"], mut["batch_stats"]

        fwd = jax.jit(
            lambda p, bs, b: jax.value_and_grad(loss_fn, has_aux=True)(p, bs, b)[1]
        )
        args = (params, batch_stats, jbatch)
    else:
        fwd = jax.jit(
            lambda v, b: model.apply(
                v, b, train=False, mode=mode, rngs={"sample": jax.random.key(7)}
            )["rec_est"]
        )
        args = (variables, jbatch)
    out = fwd(*args)
    jax.block_until_ready(out)
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(fwd.lower(*args).compile().as_text())
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(10):
            out = fwd(*args)
        jax.block_until_ready(out)
        time.sleep(1)


def report(n_iters: int = 10, top: int = 32):
    hlo = open("/tmp/fwd_hlo.txt").read()
    meta = {}
    for m in re.finditer(
        r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"'
        r'(?:.*?source_file="([^"]*)".*?source_line=(\d+))?',
        hlo,
    ):
        meta[m.group(1)] = (
            m.group(2),
            (m.group(3) or "") + ":" + (m.group(4) or ""),
        )
    f = sorted(glob.glob("/tmp/jaxtrace/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.defaultdict(float)
    raw = collections.defaultdict(float)
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            nm = e["name"]
            if nm.startswith("jit_"):
                continue
            tot += e.get("dur", 0)
            raw[nm] += e.get("dur", 0)
            op, src = meta.get(nm, ("?", "?"))
            parts = op.split("/")
            key = "/".join(parts[1:4]) if len(parts) > 1 else op
            agg[(key, src.split("/")[-1])] += e.get("dur", 0)
    print(f"device us/iter: {tot / n_iters:.0f}")
    for (key, src), us in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us / n_iters:9.1f} us  {key[:64]:64s} {src}")
    print("\n-- top raw unattributed --")
    shown = 0
    for nm, us in sorted(raw.items(), key=lambda kv: -kv[1]):
        if meta.get(nm, ("?", "?"))[0] == "?" and shown < 8:
            shown += 1
            print(f"{us / n_iters:9.1f} us  {nm}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bs = int(args[0]) if args else 1
    preset = "nuscene" if "--nuscene" in sys.argv else "bench"
    perf = {}
    for a in sys.argv[1:]:
        for key in ("densify", "fold", "ungrid_src"):
            if a.startswith(f"--{key}="):
                perf[key] = a.split("=", 1)[1]
    capture(bs, train="--train" in sys.argv, preset=preset, perf=perf,
            mode="test" if "--test" in sys.argv else "val")
    report(top=40 if "--train" in sys.argv else 32)
