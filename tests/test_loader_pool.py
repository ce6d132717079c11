"""DataLoader worker-pool behavior: persistent executors + parent preload."""

import numpy as np

from pytorch3dunet_tpu.datasets.loader import DataLoader


class _DS:
    def __init__(self):
        self.preloaded = False

    def preload(self):
        self.preloaded = True

    def __len__(self):
        return 7

    def __getitem__(self, i):
        return np.full((2, 2), i, np.float32)


def test_process_pool_persists_across_epochs_and_preloads():
    ds = _DS()
    dl = DataLoader(ds, batch_size=2, num_workers=2, worker_mode="process")
    epoch1 = [b.sum() for b in dl]
    executor = dl._executor
    assert ds.preloaded, "parent must preload the dataset before forking workers"
    epoch2 = [b.sum() for b in dl]
    assert dl._executor is executor, "worker pool must be reused across epochs"
    assert epoch1 == epoch2 and len(epoch1) == 4
