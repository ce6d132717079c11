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


class _AugDS:
    """Dataset whose transform draws from a fork-copied RandomState (as the
    real HDF5 datasets do): without per-worker reseeding every process
    replays the identical augmentation sequence."""

    def __init__(self):
        from pytorch3dunet_tpu.augment.transforms import AdditiveGaussianNoise, Compose

        rs = np.random.RandomState(0)
        self.raw_transform = Compose([AdditiveGaussianNoise(rs, scale=(0.5, 1.0), execution_probability=1.0)])

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return self.raw_transform(np.zeros((4, 4), np.float32))


def test_process_workers_decorrelate_augmentations():
    ds = _AugDS()
    dl = DataLoader(ds, batch_size=1, num_workers=2, worker_mode="process")
    batches = [np.asarray(b) for b in dl]
    # with identical fork-copied RandomStates, worker k's j-th fetch equals
    # worker k'!=k's j-th fetch; after per-worker reseeding the 16 noise
    # patches must (virtually) all differ
    flat = {b.tobytes() for b in batches}
    assert len(flat) >= 12, f"only {len(flat)} distinct augmented patches out of 16"


def test_thread_mode_serializes_paired_transforms():
    # two seed-paired pipelines sharing draw order must stay aligned even
    # with 4 worker threads fetching concurrently
    from pytorch3dunet_tpu.augment.transforms import Compose, RandomFlip

    class _PairedDS:
        def __init__(self):
            rs_raw = np.random.RandomState(7)
            rs_label = np.random.RandomState(7)
            self.raw_t = Compose([RandomFlip(rs_raw)])
            self.label_t = Compose([RandomFlip(rs_label)])

        def __len__(self):
            return 64

        def __getitem__(self, i):
            vol = np.arange(64, dtype=np.float32).reshape(4, 4, 4) + i
            return self.raw_t(vol.copy()), self.label_t(vol.copy())

    dl = DataLoader(_PairedDS(), batch_size=1, num_workers=4, worker_mode="thread")
    for raw, label in dl:
        np.testing.assert_array_equal(raw, label)


def test_process_workers_reproducible_under_manual_seed(tmpdir):
    """torch-DataLoader determinism parity: with the global RNG seeded, two
    runs produce IDENTICAL augmented batches in process mode — worker seeds
    derive from a seed + worker index (not the pid) and batches round-robin
    over the workers (batch b -> worker b % N), so each worker consumes its
    RNG stream in the same order every run."""
    import os

    import h5py

    from pytorch3dunet_tpu.datasets.utils import get_train_loaders

    rs = np.random.RandomState(3)
    path = os.path.join(str(tmpdir), "t.h5")
    vpath = os.path.join(str(tmpdir), "v.h5")
    for p in (path, vpath):
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=rs.rand(16, 96, 96))
            f.create_dataset("label", data=(rs.rand(16, 96, 96) > 0.5).astype(np.float32))

    config = {
        "device": "cpu",
        "loaders": {
            "batch_size": 1,
            "num_workers": 2,
            "worker_mode": "process",
            "raw_internal_path": "raw",
            "label_internal_path": "label",
            "train": {
                "file_paths": [path],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 48, 48],
                                  "stride_shape": [8, 48, 48], "skip_shape_check": True},
                "transformer": {
                    "raw": [{"name": "Standardize"}, {"name": "RandomFlip"},
                            {"name": "AdditiveGaussianNoise", "execution_probability": 1.0},
                            {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "RandomFlip"}, {"name": "ToTensor", "expand_dims": True}],
                },
            },
            "val": {
                "file_paths": [vpath],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 48, 48],
                                  "stride_shape": [8, 48, 48], "skip_shape_check": True},
                "transformer": {
                    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "ToTensor", "expand_dims": True}],
                },
            },
        },
    }

    def run_epoch():
        import pytorch3dunet_tpu.augment.transforms as T

        # a fresh process would start with the module-level RandomState(47);
        # simulate that (and manual_seed) for both runs
        T.GLOBAL_RANDOM_STATE = np.random.RandomState(47)
        np.random.seed(5)
        loaders = get_train_loaders(dict(config))
        return [(np.asarray(r), np.asarray(l)) for r, l in loaders["train"]]

    a = run_epoch()
    b = run_epoch()
    assert len(a) == len(b) == 8
    for (ra, la), (rb, lb) in zip(a, b):
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(la, lb)
