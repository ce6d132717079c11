"""HDF5 patch datasets (in-memory and lazy variants).

Behavior parity with the reference (pytorch3dunet/datasets/hdf5.py): patch
iteration over raw/label volumes via a SliceBuilder grid, halo-padded indices
in the test phase (hdf5.py:16-20,154-190), global-normalization stats
(:78-84), directory traversal for H5 files (:23-36), in-RAM lazy-on-first-use
caching (StandardHDF5Dataset, :256-281) vs per-access file opens
(LazyHDF5Dataset, :315-332).
"""

from abc import abstractmethod
from itertools import chain
from pathlib import Path

import h5py
import numpy as np

from pytorch3dunet_tpu.augment import transforms
from pytorch3dunet_tpu.datasets.utils import (
    ConfigDataset,
    RandomScaler,
    calculate_stats,
    get_slice_builder,
    mirror_pad,
)
from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("HDF5Dataset")


def _create_padded_indexes(indexes: tuple, halo_shape: tuple):
    """Extends each slice stop by 2*halo — patch indices into the mirror-padded volume."""
    if sum(halo_shape) == 0:
        return indexes
    return tuple(slice(index.start, index.stop + 2 * halo) for index, halo in zip(indexes, halo_shape))


def traverse_h5_paths(file_paths: list[str]) -> list[str]:
    """Expands directories into the H5 files they contain (non-recursive)."""
    assert isinstance(file_paths, list)
    results = []
    for file_path in file_paths:
        file_path = Path(file_path)
        if file_path.is_dir():
            iters = [file_path.glob(ext) for ext in ["*.h5", "*.hdf", "*.hdf5", "*.hd5"]]
            results.extend(str(fp) for fp in chain(*iters))
        else:
            results.append(str(file_path))
    return results


class AbstractHDF5Dataset(ConfigDataset):
    """Patch dataset over one H5 file.

    Args:
        file_path: path to the H5 file with raw data and (optional) labels
        phase: 'train' | 'val' | 'test'
        slice_builder_config: SliceBuilder configuration
        transformer_config: augmentation configuration
        raw_internal_path / label_internal_path: H5 dataset paths
        global_normalization: compute mean/std over the whole raw volume
        random_scale: optional multi-scale patch jitter (see RandomScaler)
        random_scale_probability: NOTE — reference parity preserves the
            reference's inverted gate (its datasets/utils.py:43-46): a draw
            BELOW this value SKIPS the scaling, i.e. the scale actually runs
            with probability 1 - random_scale_probability
    """

    def __init__(self, file_path, phase, slice_builder_config, transformer_config,
                 raw_internal_path="raw", label_internal_path="label",
                 global_normalization=False, random_scale=None, random_scale_probability=0.5):
        assert phase in ["train", "val", "test"]
        logger.info(f"Creating {self.__class__.__name__} for {phase} phase from {file_path}")
        self.phase = phase
        self.file_path = file_path
        self.raw_internal_path = raw_internal_path
        self.label_internal_path = label_internal_path

        self.halo_shape = tuple(slice_builder_config.get("halo_shape", [0, 0, 0]))

        if global_normalization:
            logger.info("Calculating mean and std of the raw data...")
            with h5py.File(file_path, "r") as f:
                raw_volume = f[raw_internal_path][:]
            stats = calculate_stats(raw_volume)
            # let the in-memory dataset adopt the already-loaded volume so
            # preload()/first access doesn't re-read multi-GB data from disk
            self._consume_stats_volume(raw_volume)
        else:
            stats = calculate_stats(None, True)

        self.transformer = transforms.Transformer(transformer_config, stats)
        self.raw_transform = self.transformer.raw_transform()

        if phase != "test":
            self.label_transform = self.transformer.label_transform()
        else:
            self.label = None
            if self.halo_shape == (0, 0, 0):
                logger.warning(
                    "Found halo shape to be (0, 0, 0). This might lead to checkerboard artifacts in the "
                    "prediction. Consider using a non-zero halo shape, e.g. 'halo_shape: [8, 8, 8]' in "
                    "the slice_builder configuration."
                )

        with h5py.File(file_path, "r") as f:
            raw = f[raw_internal_path]
            self.volume_shape = raw.shape if raw.ndim == 3 else raw.shape[1:]
            label = f[label_internal_path] if phase != "test" else None
            if label is not None:
                label_spatial = label.shape if label.ndim == 3 else label.shape[1:]
                assert label_spatial == self.volume_shape, "Raw and label shapes do not match"

            logger.info(f"Volume shape: {self.volume_shape}. Creating slices...")
            slice_builder_config = dict(slice_builder_config)
            slice_builder_config["lazy_loader"] = self.is_lazy()
            slice_builder = get_slice_builder(raw, label, slice_builder_config)
            self.raw_slices = slice_builder.raw_slices
            self.label_slices = slice_builder.label_slices

        if random_scale is not None:
            assert isinstance(random_scale, int), "random_scale must be an integer"
            stride_shape = slice_builder_config.get("stride_shape")
            assert all(random_scale < stride for stride in stride_shape), (
                f"random_scale {random_scale} must be smaller than each of the strides {stride_shape}"
            )
            patch_shape = slice_builder_config.get("patch_shape")
            self.random_scaler = RandomScaler(random_scale, patch_shape, self.volume_shape, random_scale_probability)
            logger.info(f"Using RandomScaler with offset range {random_scale}")
        else:
            self.random_scaler = None

        self.patch_count = len(self.raw_slices)

    def _consume_stats_volume(self, raw_volume: np.ndarray) -> None:
        """Hook: offered the raw volume loaded for normalization stats.
        Default drops it (lazy datasets must not retain volumes in memory)."""

    @abstractmethod
    def get_raw_patch(self, idx) -> np.ndarray:
        raise NotImplementedError

    @abstractmethod
    def get_label_patch(self, idx) -> np.ndarray:
        raise NotImplementedError

    @abstractmethod
    def get_raw_padded_patch(self, idx) -> np.ndarray:
        raise NotImplementedError

    @abstractmethod
    def is_lazy(self) -> bool:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        if idx >= len(self):
            raise StopIteration

        raw_idx = self.raw_slices[idx]

        if self.phase == "test":
            if len(raw_idx) == 4:
                # predictor wants only spatial dims; keep the channel slice for the fetch
                raw_idx = raw_idx[1:]
                raw_idx_padded = (slice(None),) + _create_padded_indexes(raw_idx, self.halo_shape)
            else:
                raw_idx_padded = _create_padded_indexes(raw_idx, self.halo_shape)

            padded_patch = self.get_raw_padded_patch(raw_idx_padded)
            raw_patch_transformed = self.raw_transform(padded_patch)
            # the predictor strips the halo and places the prediction at raw_idx
            return raw_patch_transformed, raw_idx

        label_idx = self.label_slices[idx]
        if self.random_scaler is not None:
            raw_idx, label_idx = self.random_scaler.randomize_indices(raw_idx, label_idx)

        raw_patch_transformed = self.raw_transform(self.get_raw_patch(raw_idx))
        label_patch_transformed = self.label_transform(self.get_label_patch(label_idx))

        if self.random_scaler is not None:
            raw_patch_transformed, label_patch_transformed = self.random_scaler.rescale_patches(
                raw_patch_transformed, label_patch_transformed
            )
        return raw_patch_transformed, label_patch_transformed

    def __len__(self) -> int:
        return self.patch_count

    @classmethod
    def create_datasets(cls, dataset_config: dict, phase: str):
        phase_config = dataset_config[phase]
        transformer_config = phase_config["transformer"]
        slice_builder_config = phase_config["slice_builder"]
        file_paths = traverse_h5_paths(phase_config["file_paths"])

        for file_path in file_paths:
            yield cls(
                file_path=file_path,
                phase=phase,
                slice_builder_config=slice_builder_config,
                transformer_config=transformer_config,
                raw_internal_path=dataset_config.get("raw_internal_path", "raw"),
                label_internal_path=dataset_config.get("label_internal_path", "label"),
                global_normalization=dataset_config.get("global_normalization", False),
                random_scale=dataset_config.get("random_scale", None),
                random_scale_probability=dataset_config.get("random_scale_probability", 0.5),
            )


class StandardHDF5Dataset(AbstractHDF5Dataset):
    """Loads the volumes into memory lazily on first access — fast, memory-hungry."""

    def __init__(self, file_path, phase, slice_builder_config, transformer_config,
                 raw_internal_path="raw", label_internal_path="label",
                 global_normalization=False, random_scale=None, random_scale_probability=0.5):
        # set BEFORE super().__init__: _consume_stats_volume fires inside it
        self._raw = None
        self._raw_padded = None
        self._label = None
        super().__init__(
            file_path=file_path,
            phase=phase,
            slice_builder_config=slice_builder_config,
            transformer_config=transformer_config,
            raw_internal_path=raw_internal_path,
            label_internal_path=label_internal_path,
            global_normalization=global_normalization,
            random_scale=random_scale,
            random_scale_probability=random_scale_probability,
        )

    def _consume_stats_volume(self, raw_volume: np.ndarray) -> None:
        # in-memory dataset: the volume read for stats IS the training data
        if self.phase in ("train", "val"):
            self._raw = raw_volume

    def preload(self):
        """Loads the volumes into memory NOW. The process-mode DataLoader
        calls this in the parent before forking its workers, so every worker
        shares the arrays via copy-on-write pages instead of each reading its
        own full copy of the volume (num_workers x volume RAM otherwise).
        Test phase: the halo-padded volume is what workers read, so pad it
        here too (each worker padding its own copy would cost
        num_workers x padded-volume RAM and redundant full-volume reads)."""
        with h5py.File(self.file_path, "r") as f:
            if self.phase in ("train", "val"):
                if self._raw is None:
                    self._raw = f[self.raw_internal_path][:]
                if self._label is None and self.label_internal_path is not None and self.label_internal_path in f:
                    self._label = f[self.label_internal_path][:]
            elif self._raw_padded is None:
                self._raw_padded = mirror_pad(f[self.raw_internal_path][:], self.halo_shape)

    def get_raw_patch(self, idx):
        if self._raw is None:
            with h5py.File(self.file_path, "r") as f:
                assert self.raw_internal_path in f, f"Dataset {self.raw_internal_path} not found in {self.file_path}"
                self._raw = f[self.raw_internal_path][:]
        return self._raw[idx]

    def get_label_patch(self, idx):
        if self._label is None:
            with h5py.File(self.file_path, "r") as f:
                assert self.label_internal_path in f, (
                    f"Dataset {self.label_internal_path} not found in {self.file_path}"
                )
                self._label = f[self.label_internal_path][:]
        return self._label[idx]

    def get_raw_padded_patch(self, idx):
        if self._raw_padded is None:
            with h5py.File(self.file_path, "r") as f:
                assert self.raw_internal_path in f, f"Dataset {self.raw_internal_path} not found in {self.file_path}"
                self._raw_padded = mirror_pad(f[self.raw_internal_path][:], self.halo_shape)
        return self._raw_padded[idx]

    def is_lazy(self) -> bool:
        return False


class LazyHDF5Dataset(AbstractHDF5Dataset):
    """Reads every patch straight from the file — slow, low memory footprint."""

    def __init__(self, file_path, phase, slice_builder_config, transformer_config,
                 raw_internal_path="raw", label_internal_path="label",
                 global_normalization=False, random_scale=None, random_scale_probability=0.5):
        super().__init__(
            file_path=file_path,
            phase=phase,
            slice_builder_config=slice_builder_config,
            transformer_config=transformer_config,
            raw_internal_path=raw_internal_path,
            label_internal_path=label_internal_path,
            global_normalization=global_normalization,
            random_scale=random_scale,
            random_scale_probability=random_scale_probability,
        )
        logger.info("Using LazyHDF5Dataset")

    def get_raw_patch(self, idx):
        with h5py.File(self.file_path, "r") as f:
            return f[self.raw_internal_path][idx]

    def get_label_patch(self, idx):
        with h5py.File(self.file_path, "r") as f:
            return f[self.label_internal_path][idx]

    def preload(self):
        """Lazy datasets stay on disk; the parent only ensures the cached
        'raw_padded' dataset exists BEFORE workers fork — concurrent
        first-access creation would race on the single HDF5 write handle.
        If the file is read-only the padded copy is built in the parent's
        memory instead, so forked workers share it via copy-on-write pages
        rather than each building num_workers x padded-volume copies."""
        if self.phase == "test" and not self._ensure_raw_padded():
            if getattr(self, "_raw_padded_mem", None) is None:
                with h5py.File(self.file_path, "r") as f:
                    self._raw_padded_mem = mirror_pad(f[self.raw_internal_path][:], self.halo_shape)

    def _expected_padded_shape(self, raw_shape) -> tuple:
        return tuple(s + 2 * h for s, h in zip(raw_shape[-3:], self.halo_shape))

    def _ensure_raw_padded(self) -> bool:
        """Creates the 'raw_padded' cache dataset (reference hdf5.py:315-332);
        returns False when the file is not writable (read-only mount). A stale
        cache from a run with a DIFFERENT halo shape is detected by its shape
        and rebuilt — reusing it would misalign every border patch."""
        try:
            with h5py.File(self.file_path, "a") as f:
                expected = self._expected_padded_shape(f[self.raw_internal_path].shape)
                if "raw_padded" in f and tuple(f["raw_padded"].shape[-3:]) != expected:
                    logger.warning(
                        f"'raw_padded' cache in {self.file_path} has shape {f['raw_padded'].shape}, "
                        f"expected {expected} for halo {self.halo_shape}: rebuilding"
                    )
                    del f["raw_padded"]
                if "raw_padded" not in f:
                    logger.info(f"Creating 'raw_padded' dataset in {self.file_path}")
                    raw_padded = mirror_pad(f[self.raw_internal_path][:], self.halo_shape)
                    f.create_dataset("raw_padded", data=raw_padded, compression="gzip")
            return True
        except OSError:
            return False

    def get_raw_padded_patch(self, idx):
        # the in-memory fallback (built by preload() for read-only files)
        # takes priority: re-probing the file for writability would cost one
        # failed write-open + exception per patch in the hot path
        if getattr(self, "_raw_padded_mem", None) is not None:
            return self._raw_padded_mem[idx]
        with h5py.File(self.file_path, "r") as f:
            if "raw_padded" in f and tuple(f["raw_padded"].shape[-3:]) == \
                    self._expected_padded_shape(f[self.raw_internal_path].shape):
                return f["raw_padded"][idx]
        if self._ensure_raw_padded():
            with h5py.File(self.file_path, "r") as f:
                return f["raw_padded"][idx]
        # read-only file and no preload: build the in-memory padded copy now
        with h5py.File(self.file_path, "r") as f:
            self._raw_padded_mem = mirror_pad(f[self.raw_internal_path][:], self.halo_shape)
        return self._raw_padded_mem[idx]

    def is_lazy(self) -> bool:
        return True
