"""Prefetching data loader: host datasets -> device-ready numpy batches.

Replaces torch DataLoader (reference train_flow_latent.py:62-69) with a
double-buffered background-thread loader: while the TPU runs step N, the
host assembles batch N+1 (and optionally N+2). Batches are stacked numpy
arrays; the train loop moves them onto the mesh with
``core.sharding.shard_batch`` (one host->device transfer per step).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    """batch_size here is the PER-HOST batch. For multi-host training pass
    ``shard=(jax.process_index(), jax.process_count())`` and each host reads
    only its strided slice of the (identically seeded) shuffled order — the
    DistributedSampler equivalent
    (reference downstream_tasks/train_flow_latent_inpainting.py:80-90)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 with_labels: bool = True, shard: Optional[tuple] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.with_labels = with_labels
        self.shard = shard
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.shard is not None:
            n = n // self.shard[1]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (DistributedSampler.set_epoch equivalent)."""
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # identical seed across hosts -> identical global order
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.shard is not None:
            rank, world = self.shard
            n = (len(idx) // world) * world
            idx = idx[:n][rank::world]
        return idx

    def _assemble(self, indices) -> Dict[str, np.ndarray]:
        xs, ys = [], []
        for i in indices:
            item = self.dataset[int(i)]
            x, y = item if isinstance(item, tuple) else (item, 0)
            xs.append(x)
            ys.append(y)
        batch = {"x": np.stack(xs)}
        if self.with_labels:
            batch["y"] = np.asarray(ys, np.int32)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in range(n):
                    if stop.is_set():
                        return
                    sl = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if len(sl) < self.batch_size and self.drop_last:
                        break
                    q.put(self._assemble(sl))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                yield b
        finally:
            stop.set()
