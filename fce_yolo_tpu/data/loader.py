"""Threaded prefetching data loader.

The reference uses multi-process torch DataLoaders (data/build.py:286,
InfiniteDataLoader) because torch augment code holds the GIL. Here the hot
augmentation work is cv2 (releases the GIL), so a thread pool gets true
parallelism without process-spawn/pickle overhead, and batches land as
plain numpy — the single host->device transfer happens in the train loop,
overlapped with the previous step's compute (double buffering: JAX dispatch
is async, so enqueueing step N+1's transfer while step N runs is free).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fce_yolo_tpu.data.dataset import YOLODataset, collate

__all__ = ["DataLoader", "build_dataloader"]


class DataLoader:
    """Fixed-shape batched loader with background prefetch.

    drop_last is always True in train mode: every batch has identical shape,
    so the jitted step compiles exactly once. Val pads the tail batch
    instead (with a "valid" count) to keep shapes static without dropping
    images.
    """

    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int = 16,
        shuffle: bool = True,
        workers: int = 8,
        max_labels: int = 128,
        prefetch: int = 3,
        seed: int = 0,
        drop_last: bool | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.max_labels = max_labels
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last if drop_last is not None else (dataset.mode == "train")

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int, **kw):
        self.epoch = epoch
        self.dataset.set_epoch(epoch, **kw)

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self):
        batches = self._batch_indices()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch(idxs: np.ndarray) -> dict:
            samples = [self.dataset[int(i)] for i in idxs]
            n_valid = len(samples)
            while len(samples) < self.batch_size:  # pad tail batch (val only)
                samples.append(samples[-1])
            out = collate(samples, self.max_labels, obb=getattr(self.dataset, "task", "") == "obb")
            out["n_valid"] = n_valid
            return out

        def producer():
            with ThreadPoolExecutor(self.workers) as pool:
                futures = [pool.submit(make_batch, idxs) for idxs in batches]
                for fut in futures:
                    if stop.is_set():
                        for f in futures:
                            f.cancel()
                        break
                    q.put(fut.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def build_dataloader(
    dataset: YOLODataset,
    batch_size: int,
    workers: int = 8,
    shuffle: bool = True,
    max_labels: int = 128,
    seed: int = 0,
) -> DataLoader:
    """Factory matching the reference's build_dataloader role (data/build.py:286)."""
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle and dataset.mode == "train",
        workers=workers,
        max_labels=max_labels,
        seed=seed,
    )
