"""Dataset/slice-builder integration tests.

Mirrors the reference test strategy (tests/test_dataset.py): full-coverage
patch visitation, paired raw/label augmentation consistency, halo round-trip,
directory traversal, and RandomScaler shape invariance.
"""

import os

import h5py
import numpy as np

from pytorch3dunet_tpu.datasets.hdf5 import LazyHDF5Dataset, StandardHDF5Dataset, traverse_h5_paths
from pytorch3dunet_tpu.datasets.loader import ConcatDataset, DataLoader
from pytorch3dunet_tpu.datasets.utils import (
    FilterSliceBuilder,
    RandomScaler,
    SliceBuilder,
    mirror_pad,
    remove_padding,
)

TRANSFORMER_CONFIG = {
    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
    "label": [{"name": "ToTensor", "expand_dims": True}],
}


def _create_h5(path, shape=(32, 80, 80), label_dtype=np.int64):
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(*shape))
        f.create_dataset("label", data=np.random.randint(0, 2, shape).astype(label_dtype))
    return path


def _slice_builder_config(patch, stride, **extra):
    return {"name": "SliceBuilder", "patch_shape": list(patch), "stride_shape": list(stride),
            "skip_shape_check": True, **extra}


class TestSliceBuilder:
    def test_full_coverage(self):
        raw = np.random.rand(32, 80, 80)
        sb = SliceBuilder(raw, None, (16, 40, 40), (8, 20, 20), skip_shape_check=True)
        visited = np.zeros(raw.shape, dtype=bool)
        for idx in sb.raw_slices:
            visited[idx] = True
        assert visited.all(), "every voxel must be covered by the patch grid"

    def test_tail_patch(self):
        # 30 with patch 16 stride 8: positions 0, 8, 14(tail)
        raw = np.random.rand(30, 64, 64)
        sb = SliceBuilder(raw, None, (16, 64, 64), (8, 64, 64), skip_shape_check=True)
        z_starts = sorted({s[0].start for s in sb.raw_slices})
        assert z_starts == [0, 8, 14]

    def test_min_hw_check(self):
        raw = np.random.rand(32, 32, 32)
        try:
            SliceBuilder(raw, None, (16, 32, 32), (8, 16, 16))
            raised = False
        except AssertionError:
            raised = True
        assert raised, "H/W < 64 must be rejected without skip_shape_check"

    def test_filter_slice_builder(self):
        raw = np.random.rand(32, 80, 80)
        label = np.zeros((32, 80, 80), dtype=np.int64)
        label[:, :8, :8] = 1  # only one corner has content
        sb = FilterSliceBuilder(raw, label, (16, 40, 40), (16, 40, 40), threshold=0.5,
                                slack_acceptance=0.0, skip_shape_check=True)
        assert len(sb.raw_slices) < 8  # most patches rejected

    def test_4d_raw(self):
        raw = np.random.rand(3, 32, 80, 80)
        sb = SliceBuilder(raw, None, (16, 40, 40), (16, 40, 40), skip_shape_check=True)
        assert all(len(idx) == 4 for idx in sb.raw_slices)
        assert sb.raw_slices[0][0] == slice(0, 3)


class TestHDF5Dataset:
    def _patch_coverage(self, dataset_cls, tmpdir):
        path = _create_h5(os.path.join(tmpdir, "cov.h5"))
        ds = dataset_cls(
            file_path=path,
            phase="test",
            slice_builder_config=_slice_builder_config((16, 40, 40), (8, 20, 20)),
            transformer_config=TRANSFORMER_CONFIG,
        )
        visited = np.zeros(ds.volume_shape, dtype=bool)
        for i in range(len(ds)):
            patch, idx = ds[i]
            assert patch.ndim == 4
            visited[idx] = True
        assert visited.all()

    def test_standard_coverage(self, tmpdir):
        self._patch_coverage(StandardHDF5Dataset, tmpdir)

    def test_lazy_coverage(self, tmpdir):
        self._patch_coverage(LazyHDF5Dataset, tmpdir)

    def test_train_phase_pairs(self, tmpdir):
        path = _create_h5(os.path.join(tmpdir, "train.h5"))
        ds = StandardHDF5Dataset(
            file_path=path,
            phase="train",
            slice_builder_config=_slice_builder_config((16, 40, 40), (16, 40, 40)),
            transformer_config=TRANSFORMER_CONFIG,
        )
        raw, label = ds[0]
        assert raw.shape == (1, 16, 40, 40)
        assert label.shape == (1, 16, 40, 40)

    def test_augmentation_consistency(self, tmpdir):
        """Geometric transforms must act identically on raw and label."""
        path = os.path.join(tmpdir, "aug.h5")
        volume = np.random.rand(32, 80, 80)
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=volume)
            f.create_dataset("label", data=volume)  # identical content

        cfg = {
            "raw": [
                {"name": "RandomFlip"},
                {"name": "RandomRotate90"},
                {"name": "ToTensor", "expand_dims": True},
            ],
            "label": [
                {"name": "RandomFlip"},
                {"name": "RandomRotate90"},
                {"name": "ToTensor", "expand_dims": True},
            ],
        }
        ds = StandardHDF5Dataset(
            file_path=path,
            phase="train",
            slice_builder_config=_slice_builder_config((16, 40, 40), (16, 40, 40)),
            transformer_config=cfg,
        )
        for i in range(min(4, len(ds))):
            raw, label = ds[i]
            np.testing.assert_allclose(np.asarray(raw), np.asarray(label, dtype=raw.dtype))

    def test_halo_roundtrip(self, tmpdir):
        """Halo-padded patches, after halo removal, must equal the source patch."""
        path = _create_h5(os.path.join(tmpdir, "halo.h5"))
        halo = (4, 8, 8)
        ds = StandardHDF5Dataset(
            file_path=path,
            phase="test",
            slice_builder_config=_slice_builder_config((16, 40, 40), (16, 40, 40), halo_shape=list(halo)),
            transformer_config={"raw": [{"name": "ToTensor", "expand_dims": True}]},
        )
        with h5py.File(path, "r") as f:
            raw_volume = f["raw"][:]
        for i in range(len(ds)):
            patch, idx = ds[i]
            assert patch.shape[1:] == tuple(2 * h + (s.stop - s.start) for h, s in zip(halo, idx))
            unpadded = remove_padding(np.asarray(patch), halo)[0]
            np.testing.assert_allclose(unpadded, raw_volume[idx], rtol=1e-6)

    def test_traverse_h5_paths(self, tmpdir):
        d = os.path.join(tmpdir, "h5dir")
        os.makedirs(d)
        for name in ["a.h5", "b.hdf5", "c.txt"]:
            open(os.path.join(d, name), "w").close()
        single = os.path.join(tmpdir, "x.h5")
        open(single, "w").close()
        found = traverse_h5_paths([d, single])
        assert single in found
        assert any(p.endswith("a.h5") for p in found)
        assert any(p.endswith("b.hdf5") for p in found)
        assert not any(p.endswith("c.txt") for p in found)


class TestRandomScaler:
    def test_shape_invariance(self):
        patch_shape = (16, 40, 40)
        volume_shape = (32, 80, 80)
        scaler = RandomScaler(4, patch_shape, volume_shape, execution_probability=0.0)
        raw_idx = (slice(8, 24), slice(20, 60), slice(20, 60))
        volume = np.random.rand(*volume_shape)
        labels = np.random.randint(0, 3, volume_shape)
        for _ in range(20):
            r_idx, l_idx = scaler.randomize_indices(raw_idx, raw_idx)
            raw_patch = volume[r_idx]
            label_patch = labels[l_idx]
            raw_out, label_out = scaler.rescale_patches(raw_patch, label_patch)
            assert raw_out.shape == patch_shape
            assert label_out.shape == patch_shape
            assert label_out.dtype == labels.dtype

    def test_4d_patches(self):
        patch_shape = (8, 32, 32)
        volume_shape = (16, 64, 64)
        scaler = RandomScaler(3, patch_shape, volume_shape, execution_probability=0.0)
        raw_idx = (slice(0, 2), slice(4, 12), slice(16, 48), slice(16, 48))
        volume = np.random.rand(2, *volume_shape)
        for _ in range(10):
            r_idx, _ = scaler.randomize_indices(raw_idx, raw_idx)
            raw_out, _ = scaler.rescale_patches(volume[r_idx], volume[r_idx])
            assert raw_out.shape == (2, *patch_shape)


class TestLoader:
    def test_mirror_pad_roundtrip(self):
        vol = np.random.rand(8, 16, 16)
        padded = mirror_pad(vol, (2, 4, 4))
        assert padded.shape == (12, 24, 24)
        np.testing.assert_array_equal(remove_padding(padded, (2, 4, 4)), vol)

    def test_dataloader_batches(self, tmpdir):
        path = _create_h5(os.path.join(tmpdir, "dl.h5"))
        ds = StandardHDF5Dataset(
            file_path=path,
            phase="train",
            slice_builder_config=_slice_builder_config((16, 40, 40), (8, 20, 20)),
            transformer_config=TRANSFORMER_CONFIG,
        )
        loader = DataLoader(ConcatDataset([ds]), batch_size=4, shuffle=True, num_workers=2)
        total = 0
        for raw, label in loader:
            assert raw.shape[1:] == (1, 16, 40, 40)
            assert raw.shape[0] <= 4
            total += raw.shape[0]
        assert total == len(ds)


def test_lazy_raw_padded_stale_halo_cache_rebuilt(tmpdir):
    """A 'raw_padded' cache built with a different halo must be rebuilt, not
    silently reused (it would misalign every border patch)."""
    import h5py

    from pytorch3dunet_tpu.datasets.hdf5 import LazyHDF5Dataset

    path = os.path.join(str(tmpdir), "vol.h5")
    vol = np.random.RandomState(0).rand(16, 70, 70).astype("float32")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=vol)

    def build(halo):
        return LazyHDF5Dataset(
            path, "test",
            {"name": "SliceBuilder", "patch_shape": [8, 64, 64], "stride_shape": [8, 64, 64],
             "halo_shape": list(halo), "skip_shape_check": True},
            {"raw": [{"name": "ToTensor", "expand_dims": True}]},
        )

    ds_a = build((2, 4, 4))
    ds_a.preload()
    with h5py.File(path, "r") as f:
        assert f["raw_padded"].shape == (20, 78, 78)

    ds_b = build((4, 8, 8))  # different halo: stale cache must be replaced
    patch = ds_b.get_raw_padded_patch((slice(0, 16), slice(0, 20), slice(0, 20)))
    with h5py.File(path, "r") as f:
        assert f["raw_padded"].shape == (24, 86, 86)
    from pytorch3dunet_tpu.datasets.utils import mirror_pad

    np.testing.assert_array_equal(patch, mirror_pad(vol, (4, 8, 8))[0:16, 0:20, 0:20])
