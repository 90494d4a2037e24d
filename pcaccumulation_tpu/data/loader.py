"""Batched, prefetching data loader over static-shape samples.

Replaces torch's DataLoader + ragged collate (libs/dataloader.py:7-40):
because every sample is already padded to static capacities, collation is
a plain stack — no batch-index prepending or voxel-offset bookkeeping.

Two prefetch modes overlap host preprocessing with device compute:

- ``mode="thread"``: a thread pool. Cheap, zero-copy handoff; the
  numpy/ctypes parts of prep release the GIL, but pure-Python glue
  serializes across threads.
- ``mode="process"``: forked worker PROCESSES, the reference's
  input-parallelism model (torch DataLoader with num_workers=7,
  libs/dataloader.py:57, configs/default.yaml:28). Sidesteps the GIL
  entirely, so per-sample prep scales with host cores — the mode to use
  when one step consumes many samples (e.g. an 8-chip data-parallel mesh
  at 8 samples/step/host). Batches cross process boundaries by pickle
  (a few ms per padded batch — small vs the ~30 ms prep, see
  tools/PROFILE_r13.md). Workers must never touch jax: they only run
  numpy + the ctypes native host library, so inheriting the parent's
  initialized jax runtime across fork is safe.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class _WorkerError:
    """Sentinel carrying a prefetch-worker exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class _WorkerFailure:
    """Picklable cross-process variant of _WorkerError: carries the
    worker's formatted traceback (exception objects themselves may not
    survive pickling)."""

    def __init__(self, repr_: str, tb: str):
        self.repr = repr_
        self.tb = tb


def _process_worker(dataset, batch_list, out_q):
    """Worker-process body: prep + collate an index-batch list, pushing
    results (or one terminal _WorkerFailure) into out_q."""
    try:
        for b in batch_list:
            out_q.put(collate([dataset[int(i)] for i in b]))
    except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
        import traceback

        out_q.put(_WorkerFailure(repr(e), traceback.format_exc()))


class make_loader:
    """Iterable over shuffled, collated batches.

    Args:
      dataset: indexable dataset returning padded sample dicts.
      batch_size: samples per batch.
      shuffle: reshuffle indices every epoch.
      num_workers: prefetch workers (0 = synchronous).
      drop_last: drop the trailing partial batch.
      seed: shuffle seed.
      mode: "thread" (pool of prefetch threads) or "process" (forked
        worker processes, the reference's DataLoader model — see module
        docstring). Ignored when num_workers <= 0.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, drop_last: bool = True, seed: int = 0,
                 process_id: int = 0, process_count: int = 1,
                 mode: str = "thread"):
        if mode not in ("thread", "process"):
            raise ValueError(f"mode must be 'thread' or 'process', got {mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.mode = mode
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        # multi-host input sharding: every process shuffles with the SAME
        # seed, then takes a disjoint round-robin slice of the batch list
        # (mirrors the reference's DatasetSampler shuffling, dataset.py:10-20,
        # extended across hosts). Lengths are trimmed so all hosts run the
        # same number of steps.
        self.process_id = process_id
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        nb = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return nb // self.process_count if self.process_count > 1 else nb

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        n = len(self.dataset)
        nb_total = (
            n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        )
        batches = [
            idx[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb_total)
        ]
        if self.process_count > 1:
            batches = batches[self.process_id::self.process_count][:len(self)]
        return batches

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return
        if self.mode == "process":
            yield from self._iter_process(batches)
            return

        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def worker(batch_list):
            for b in batch_list:
                if stop.is_set():
                    return
                try:
                    q.put(collate([self.dataset[int(i)] for i in b]))
                except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                    # surface the failure instead of deadlocking the
                    # consumer's q.get() (reference prints per-batch
                    # exceptions — libs/trainer.py:234-235; we fail fast)
                    q.put(_WorkerError(e))
                    return

        chunks = [batches[i::self.num_workers] for i in range(self.num_workers)]
        threads = [threading.Thread(target=worker, args=(c,), daemon=True) for c in chunks]
        for t in threads:
            t.start()
        try:
            # workers interleave; order differs from `batches` but every
            # batch is produced exactly once
            for _ in range(len(batches)):
                item = q.get()
                if isinstance(item, _WorkerError):
                    raise RuntimeError("data loader worker failed") from item.exc
                yield item
        finally:
            stop.set()

    def _iter_process(self, batches):
        """Process-mode epoch: worker i preps batches[i::W] into its own
        bounded queue; the consumer round-robins the queues, which
        reproduces the ORIGINAL batch order deterministically (batch j
        sits at position j // W of worker (j % W)'s queue) — unlike
        thread mode's arbitrary interleave. A worker that raises sends a
        terminal _WorkerFailure; a worker that DIES (segfault, OOM kill)
        is detected by liveness polling, so the consumer never deadlocks
        on a queue nothing will fill."""
        import multiprocessing as mp

        if not batches:
            return
        w = min(self.num_workers, len(batches))
        # fork: inherits the dataset (no pickling of self.dataset) and the
        # loaded ctypes native library; workers never call jax (see module
        # docstring), which is what makes fork-after-jax-init safe here
        ctx = mp.get_context("fork")
        procs, qs = [], []
        for i in range(w):
            q = ctx.Queue(maxsize=2)  # backpressure: bound host RSS
            p = ctx.Process(
                target=_process_worker,
                args=(self.dataset, batches[i::w], q),
                daemon=True,
            )
            p.start()
            procs.append(p)
            qs.append(q)
        try:
            for j in range(len(batches)):
                i = j % w
                while True:
                    try:
                        item = qs[i].get(timeout=1.0)
                        break
                    except queue.Empty:
                        if not procs[i].is_alive():
                            # drain the pipe once more: the worker may have
                            # flushed its last item right before exiting
                            try:
                                item = qs[i].get(timeout=1.0)
                                break
                            except queue.Empty:
                                raise RuntimeError(
                                    f"data loader worker {i} died "
                                    f"(exit code {procs[i].exitcode}) "
                                    "without reporting an error"
                                ) from None
                if isinstance(item, _WorkerFailure):
                    raise RuntimeError(
                        f"data loader worker failed: {item.repr}\n{item.tb}"
                    )
                yield item
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)
            for q in qs:
                q.close()
                q.cancel_join_thread()
