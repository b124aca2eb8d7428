"""DataLoader: shuffling, per-process sharding, batching, threaded prefetch.

Replaces torch DataLoader + DistributedSampler (reference run.py:41-80 +
Accelerate's prepare()). Semantics preserved:
- per-epoch deterministic shuffle (seed + epoch)
- per-process contiguous-interleaved shard with padding so every process
  sees the same number of batches (DistributedSampler behavior)
- drop_last
- numpy collation: arrays stacked, scalars -> arrays, strings -> lists

The loader is pure host code: decode/crop runs in a thread pool overlapping
device steps (the jitted step releases the GIL while the TPU runs).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, List, Optional, Sequence

import numpy as np

import jax


def default_collate(samples: Sequence[Any]):
    """Stack a list of samples into batch arrays (tuple/dict aware)."""
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, str):
        return list(samples)
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(samples)
    return list(samples)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        shard_across_processes: bool = True,
        prefetch: int = 2,
        **_ignored,  # torch-only kwargs in reference TOMLs (pin_memory, ...)
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.epoch = 0
        self.shard = shard_across_processes
        self.prefetch = max(1, prefetch)

    # Number of batches each process sees per epoch.
    def __len__(self) -> int:
        n = len(self.dataset)
        world = jax.process_count() if self.shard else 1
        per_proc = n // world if self.drop_last else -(-n // world)
        if self.drop_last:
            return per_proc // self.batch_size
        return -(-per_proc // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n).tolist()
        else:
            idx = list(range(n))
        if self.shard and jax.process_count() > 1:
            world, rank = jax.process_count(), jax.process_index()
            if self.drop_last:
                total = (n // world) * world
                idx = idx[:total]
            else:
                # pad by wrapping so each process sees the same count
                total = -(-n // world) * world
                idx = (idx + idx)[:total]
            idx = idx[rank::world]
        return idx

    def __iter__(self) -> Iterator[Any]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate_fn([self.dataset[i] for i in b])
            return

        yield from self._threaded_iter(batches)

    def _threaded_iter(self, batches: List[List[int]]):
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        out_q.put(("ok", self.collate_fn(samples)))
                out_q.put(("done", None))
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(("err", e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
