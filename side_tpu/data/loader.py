"""Threaded prefetching batch loader.

TPU-native replacement for torch DataLoader(num_workers=N)
(/root/reference/src/testTrain.py:70-77): a thread pool decodes/augments
samples (cv2 releases the GIL) while the device consumes previous batches;
batches are plain NumPy dicts ready for `jax.device_put`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import collate


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 seed: int = 0, prefetch: int = 2, keep_meta: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.keep_meta = keep_meta

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield idx[i:i + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        STOP = object()

        def make_batch(batch_idx):
            samples = list(pool.map(self.dataset.__getitem__, batch_idx))
            batch = collate(samples)
            if not self.keep_meta:
                batch.pop("meta", None)
            return batch

        def producer():
            try:
                for batch_idx in self._batches():
                    q.put(make_batch(batch_idx))
            finally:
                q.put(STOP)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is STOP:
                    break
                yield item
        finally:
            pool.shutdown(wait=False)
