"""Batched, prefetching data loader over static-shape samples.

Replaces torch's DataLoader + ragged collate (libs/dataloader.py:7-40):
because every sample is already padded to static capacities, collation is
a plain stack — no batch-index prepending or voxel-offset bookkeeping.
A thread pool overlaps host preprocessing with device compute.
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


class make_loader:
    """Iterable over shuffled, collated batches.

    Args:
      dataset: indexable dataset returning padded sample dicts.
      batch_size: samples per batch.
      shuffle: reshuffle indices every epoch.
      num_workers: prefetch threads (0 = synchronous).
      drop_last: drop the trailing partial batch.
      seed: shuffle seed.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, drop_last: bool = True, seed: int = 0,
                 process_id: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
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
