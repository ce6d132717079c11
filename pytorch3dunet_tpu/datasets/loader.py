"""Thread-based batch loader with background prefetch.

Replaces the reference's multi-process torch DataLoader
(pytorch3dunet/datasets/utils.py:408-422) with a thread pool: HDF5 reads and
the heavy numpy/scipy augmentations release the GIL, so threads overlap the
host pipeline with device compute without process-spawn/pickling overhead —
and the arrays they produce can be fed straight to `jax.device_put` without a
worker->main copy.
"""

import math
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class ConcatDataset:
    """Concatenation of several datasets (torch ConcatDataset analog)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        assert self.datasets, "datasets should not be an empty iterable"
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx):
        if idx < 0:
            idx += len(self)
        dataset_idx = int(np.searchsorted(self.cumulative_sizes, idx, side="right"))
        sample_idx = idx if dataset_idx == 0 else idx - self.cumulative_sizes[dataset_idx - 1]
        return self.datasets[dataset_idx][sample_idx]


def default_collate(batch):
    """Stacks array samples; recursively transposes tuple samples."""
    first = batch[0]
    if isinstance(first, np.ndarray):
        return np.stack(batch, 0)
    if isinstance(first, (int, float)):
        return np.asarray(batch)
    if isinstance(first, (list, tuple)):
        return [default_collate(list(samples)) for samples in zip(*batch)]
    raise TypeError(f"unsupported sample type: {type(first)}")


class DataLoader:
    """Iterates a dataset in batches, fetching batches ahead in worker threads.

    API mirrors the subset of torch's DataLoader the framework needs:
    `len(loader)` is the number of batches; iteration yields collated batches.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=1, collate_fn=None,
                 drop_last=False, prefetch_batches=None, seed=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, int(num_workers))
        self.collate_fn = collate_fn or default_collate
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches or (self.num_workers + 2)
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _batch_indices(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        nb = len(self)
        for b in range(nb):
            yield indices[b * self.batch_size : (b + 1) * self.batch_size]

    def _fetch(self, batch_idx):
        return self.collate_fn([self.dataset[int(i)] for i in batch_idx])

    def __iter__(self):
        batches = self._batch_indices()
        with ThreadPoolExecutor(max_workers=self.num_workers, thread_name_prefix="loader") as executor:
            window: deque = deque()
            try:
                for _ in range(self.prefetch_batches):
                    window.append(executor.submit(self._fetch, next(batches)))
            except StopIteration:
                pass
            while window:
                result = window.popleft().result()
                try:
                    window.append(executor.submit(self._fetch, next(batches)))
                except StopIteration:
                    pass
                yield result
