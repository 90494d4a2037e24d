"""Input-pipeline throughput: thread vs process workers (VERDICT r4 #1).

Measures host prep throughput (samples/s) of the full dataset path
(npz read -> augment -> crop -> ground filter -> voxelize -> sort -> pad
-> collate) for the synchronous loader and for {1, 2, 4} thread and
process workers, at nuScenes production capacities.

The question on record: the reference feeds its GPU with 7 worker
PROCESSES (torch DataLoader, configs/default.yaml:28 +
libs/dataloader.py:57); the rebuild's thread mode is GIL-bound for the
pure-Python parts of prep. On a multi-core host feeding an 8-chip
data-parallel mesh (8 samples/step), processes are the mode that scales.
This host has ONE core (`nproc` = 1), so neither mode can exceed 1x here
— the table this produces is the honest single-core record plus the
per-batch IPC overhead of process mode (the only cost that could make it
a wrong default on many-core hosts).

    python tools/profile_loader.py [--samples 24] [--repeat 3]

Results: tools/PROFILE_r13.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcaccumulation_tpu.config import load_config  # noqa: E402
from pcaccumulation_tpu.data.dataset import SceneDataset  # noqa: E402
from pcaccumulation_tpu.data.loader import collate, make_loader  # noqa: E402
from pcaccumulation_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402


def build_dataset(tmp, n_samples, cfg):
    write_synthetic_dataset(tmp, n_samples=n_samples,
                            n_frames=cfg["voxel_generator"]["n_sweeps"])
    cfg["path"]["dataset_base"] = tmp
    return SceneDataset(cfg, "train")


def time_loader(ds, batch_size, num_workers, mode, repeat):
    best = float("inf")
    n = 0
    for _ in range(repeat):
        ld = make_loader(ds, batch_size=batch_size, num_workers=num_workers,
                         mode=mode, shuffle=False, drop_last=True, seed=0)
        t0 = time.perf_counter()
        n = sum(b["points"].shape[0] for b in ld)
        best = min(best, time.perf_counter() - t0)
    return n / best, best


def time_ipc(ds, repeat=5):
    """Per-batch pickle+pipe cost of process mode, isolated: round-trip one
    collated batch through an mp.Queue to an echo process (a same-thread
    Pipe send of a multi-MB batch would deadlock on the pipe buffer)."""
    import multiprocessing as mp
    import pickle

    batch = collate([ds[0]])
    nbytes = sum(v.nbytes for v in batch.values())
    t0 = time.perf_counter()
    for _ in range(repeat):
        blob = pickle.dumps(batch, protocol=pickle.HIGHEST_PROTOCOL)
        pickle.loads(blob)
    t_pickle = (time.perf_counter() - t0) / repeat

    ctx = mp.get_context("fork")
    inq, outq = ctx.Queue(), ctx.Queue()
    proc = ctx.Process(target=_echo_worker, args=(inq, outq), daemon=True)
    proc.start()
    outq.get()  # worker ready
    t0 = time.perf_counter()
    for _ in range(repeat):
        inq.put(batch)
        outq.get()
    t_pipe = (time.perf_counter() - t0) / repeat
    inq.put(None)
    proc.join(timeout=5)
    return nbytes, t_pickle, t_pipe


def _echo_worker(inq, outq):
    outq.put("ready")
    while True:
        item = inq.get()
        if item is None:
            return
        outq.put(item)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--config", default="configs/nuscene.yaml")
    args = ap.parse_args()

    cfg = load_config(args.config)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ds = build_dataset(tmp, args.samples, cfg)
        print(f"host cores: {os.cpu_count()}  dataset: {len(ds)} samples "
              f"(T={cfg['voxel_generator']['n_sweeps']}, "
              f"max_points={cfg['capacity']['max_points']})")

        nbytes, t_pickle, t_pipe = time_ipc(ds)
        print(f"IPC per 1-sample batch: {nbytes / 1e6:.1f} MB, "
              f"pickle roundtrip {t_pickle * 1e3:.1f} ms, "
              f"pipe roundtrip {t_pipe * 1e3:.1f} ms")

        rate0, t0 = time_loader(ds, 1, 0, "thread", args.repeat)
        print(f"{'sync':>12}: {rate0:6.1f} samples/s   "
              f"({1e3 / rate0:.1f} ms/sample)")
        for mode in ("thread", "process"):
            for w in (1, 2, 4):
                rate, _ = time_loader(ds, 1, w, mode, args.repeat)
                print(f"{mode + ' x' + str(w):>12}: {rate:6.1f} samples/s   "
                      f"(x{rate / rate0:.2f} vs sync)")


if __name__ == "__main__":
    main()
