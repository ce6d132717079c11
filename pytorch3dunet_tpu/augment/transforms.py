"""Config-driven augmentation pipeline (host-side numpy).

Capability parity with the reference (pytorch3dunet/augment/transforms.py):
the same transform names, config keys and RNG-pairing semantics — the
`Transformer` factory seeds every transform in a phase with one shared seed so
the geometric transforms applied to the raw and label patches line up
(transforms.py:905-934). Label-engineering transforms (boundaries/affinities)
use the scipy/numpy ops from `pytorch3dunet_tpu.utils.ndimage` instead of
scikit-image.

The arrays here are ZYX (3D) or CZYX (4D) numpy patches, exactly as produced
by the HDF5 datasets; `ToTensor`/`LabelToTensor` emit numpy arrays in the
requested dtype (the device transfer happens later, in the batch loader).

A faster on-device path for the cheap geometric/intensity transforms exists in
`pytorch3dunet_tpu.ops`; this module is the semantics-defining reference
implementation and the default.
"""

import importlib
import random
from collections.abc import Callable

import numpy as np
from scipy.ndimage import convolve, gaussian_filter, map_coordinates, rotate

from pytorch3dunet_tpu.utils import ndimage

# Fixed module-level random state: reproducible pipelines by default, matching
# the reference convention (transforms.py:13).
GLOBAL_RANDOM_STATE = np.random.RandomState(47)


def _recover_ignore_index(input, orig, ignore_index):
    if ignore_index is not None:
        mask = orig == ignore_index
        input[mask] = ignore_index
    return input


class Compose:
    """Applies a list of transforms in sequence."""

    def __init__(self, transforms: list[Callable[[np.ndarray], np.ndarray]]):
        self.transforms = transforms

    def __call__(self, m):
        for t in self.transforms:
            m = t(m)
        return m

    def reseed(self, seed: int):
        """Reseeds every transform's RandomState to `seed`. Forked DataLoader
        workers call this (same seed for the raw AND label pipeline, so
        paired geometric draws stay in lockstep) — without it every worker
        inherits identical fork-copied RandomStates and produces the same
        augmentation sequence."""
        for t in self.transforms:
            rs = getattr(t, "random_state", None)
            if rs is not None and hasattr(rs, "seed"):
                rs.seed(seed)


# ---------------------------------------------------------------------------
# geometric transforms (shared RNG draws keep raw/label patches aligned)
# ---------------------------------------------------------------------------


class RandomFlip:
    """Randomly flips a 3D (DxHxW) or 4D (CxDxHxW) patch across each spatial axis.

    Each spatial axis is flipped independently with probability 1 - axis_prob
    (the reference flips when uniform() > axis_prob, transforms.py:50).
    """

    def __init__(self, random_state: np.random.RandomState, axis_prob: float = 0.5, **kwargs):
        assert random_state is not None, "RandomState cannot be None"
        self.random_state = random_state
        self.axes = (0, 1, 2)
        self.axis_prob = axis_prob

    def __call__(self, m: np.ndarray) -> np.ndarray:
        assert m.ndim in [3, 4], "Supports only 3D (DxHxW) or 4D (CxDxHxW) images"
        offset = m.ndim - 3
        for axis in self.axes:
            if self.random_state.uniform() > self.axis_prob:
                m = np.flip(m, axis + offset)
        return m


class RandomRotate90:
    """Rotates the patch by a random multiple of 90 degrees in the HW plane.

    Assumes DHW axis order (rotation across the last two axes); the z-axis is
    preserved, matching the reference (transforms.py:60-90).
    """

    def __init__(self, random_state: np.random.RandomState, **kwargs):
        self.random_state = random_state

    def __call__(self, m: np.ndarray) -> np.ndarray:
        assert m.ndim in [3, 4], "Supports only 3D (DxHxW) or 4D (CxDxHxW) images"
        k = self.random_state.randint(0, 4)
        offset = m.ndim - 3
        return np.rot90(m, k, axes=(1 + offset, 2 + offset))


class RandomRotate:
    """Rotates by a random angle from (-angle_spectrum, angle_spectrum) around a
    randomly chosen axis pair (transforms.py:93-139)."""

    def __init__(self, random_state, angle_spectrum: int = 30, axes: list = None, mode: str = "reflect",
                 order: int = 0, **kwargs):
        if axes is None:
            axes = [(1, 0), (2, 1), (2, 0)]
        else:
            assert isinstance(axes, list) and len(axes) > 0
        self.random_state = random_state
        self.angle_spectrum = angle_spectrum
        self.axes = axes
        self.mode = mode
        self.order = order

    def __call__(self, m: np.ndarray) -> np.ndarray:
        axis = self.axes[self.random_state.randint(len(self.axes))]
        angle = self.random_state.randint(-self.angle_spectrum, self.angle_spectrum)

        if m.ndim == 3:
            return rotate(m, angle, axes=axis, reshape=False, order=self.order, mode=self.mode, cval=-1)
        # same rotation for every channel
        rotated = [rotate(c, angle, axes=axis, reshape=False, order=self.order, mode=self.mode, cval=-1) for c in m]
        return np.stack(rotated, axis=0)


class ElasticDeformation:
    """Per-voxel elastic deformation from Gaussian-smoothed random displacement
    fields (transforms.py:206-269). Use spline_order=0 for label patches.

    ~1 s/patch on CPU for 64x200x200; the data loader overlaps this with
    device compute.
    """

    def __init__(self, random_state, spline_order: int, alpha: int = 2000, sigma: int = 50,
                 execution_probability: float = 0.1, apply_3d: bool = True, **kwargs):
        self.random_state = random_state
        self.spline_order = spline_order
        self.alpha = alpha
        self.sigma = sigma
        self.execution_probability = execution_probability
        self.apply_3d = apply_3d

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.random_state.uniform() >= self.execution_probability:
            return m
        assert m.ndim in [3, 4]
        volume_shape = m.shape if m.ndim == 3 else m[0].shape

        if self.apply_3d:
            dz = gaussian_filter(self.random_state.randn(*volume_shape), self.sigma, mode="reflect") * self.alpha
        else:
            dz = np.zeros(volume_shape)

        dy, dx = (
            gaussian_filter(self.random_state.randn(*volume_shape), self.sigma, mode="reflect") * self.alpha
            for _ in range(2)
        )

        z_dim, y_dim, x_dim = volume_shape
        z, y, x = np.meshgrid(np.arange(z_dim), np.arange(y_dim), np.arange(x_dim), indexing="ij")
        indices = z + dz, y + dy, x + dx

        if m.ndim == 3:
            return map_coordinates(m, indices, order=self.spline_order, mode="reflect")
        return np.stack([map_coordinates(c, indices, order=self.spline_order, mode="reflect") for c in m], axis=0)


class CropToFixed:
    """Crops (or reflect-pads) the HW plane to a fixed size; random or centered
    corner (transforms.py:272-335)."""

    def __init__(self, random_state, size: tuple = (256, 256), centered: bool = False, **kwargs):
        self.random_state = random_state
        self.crop_y, self.crop_x = size
        self.centered = centered

    def __call__(self, m: np.ndarray) -> np.ndarray:
        def _padding(pad_total):
            half = pad_total // 2
            return half, pad_total - half

        def _rand_range_and_pad(crop_size, max_size):
            if crop_size < max_size:
                return max_size - crop_size, (0, 0)
            return 1, _padding(crop_size - max_size)

        def _start_and_pad(crop_size, max_size):
            if crop_size < max_size:
                return (max_size - crop_size) // 2, (0, 0)
            return 0, _padding(crop_size - max_size)

        assert m.ndim in (3, 4)
        y, x = m.shape[-2], m.shape[-1]

        if not self.centered:
            y_range, y_pad = _rand_range_and_pad(self.crop_y, y)
            x_range, x_pad = _rand_range_and_pad(self.crop_x, x)
            y_start = self.random_state.randint(y_range)
            x_start = self.random_state.randint(x_range)
        else:
            y_start, y_pad = _start_and_pad(self.crop_y, y)
            x_start, x_pad = _start_and_pad(self.crop_x, x)

        cropped = m[..., :, y_start : y_start + self.crop_y, x_start : x_start + self.crop_x]
        lead_pad = [(0, 0)] * (m.ndim - 2)
        return np.pad(cropped, pad_width=[*lead_pad, y_pad, x_pad], mode="reflect")


# ---------------------------------------------------------------------------
# intensity transforms
# ---------------------------------------------------------------------------


class RandomContrast:
    """Scales voxels to mean + alpha * (v - mean), clipped to [-1, 1]
    (transforms.py:142-172)."""

    def __init__(self, random_state, alpha=(0.5, 1.5), mean: float = 0.0, execution_probability: float = 0.1,
                 **kwargs):
        self.random_state = random_state
        assert len(alpha) == 2
        self.alpha = alpha
        self.mean = mean
        self.execution_probability = execution_probability

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.random_state.uniform() < self.execution_probability:
            alpha = self.random_state.uniform(self.alpha[0], self.alpha[1])
            return np.clip(self.mean + alpha * (m - self.mean), -1, 1)
        return m


class RandomGammaCorrection:
    """Rescales to [0, 1] then applies v ** gamma (transforms.py:175-203)."""

    def __init__(self, random_state, gamma=(0.5, 1.5), execution_probability: float = 0.1, **kwargs):
        self.random_state = random_state
        assert len(gamma) == 2
        self.gamma = gamma
        self.execution_probability = execution_probability

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.random_state.uniform() < self.execution_probability:
            m = ndimage.rescale_intensity(m, out_range=(0, 1))
            gamma = self.random_state.uniform(self.gamma[0], self.gamma[1])
            return ndimage.adjust_gamma(m, gamma)
        return m


class Standardize:
    """Z-score normalization, optionally channel-wise or with precomputed
    stats (transforms.py:653-688)."""

    def __init__(self, eps: float = 1e-10, mean: float = None, std: float = None, channelwise: bool = False,
                 **kwargs):
        if mean is not None or std is not None:
            assert mean is not None and std is not None
        self.mean = mean
        self.std = std
        self.eps = eps
        self.channelwise = channelwise

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.mean is not None:
            mean, std = self.mean, self.std
        elif self.channelwise:
            axes = tuple(range(1, m.ndim))
            mean = np.mean(m, axis=axes, keepdims=True)
            std = np.std(m, axis=axes, keepdims=True)
        else:
            mean, std = np.mean(m), np.std(m)
        return (m - mean) / np.clip(std, a_min=self.eps, a_max=None)


class PercentileNormalizer:
    """Normalizes by the [pmin, pmax] percentile window (transforms.py:691-711)."""

    def __init__(self, pmin: float = 1.0, pmax: float = 99.6, channelwise: bool = False, eps: float = 1e-10,
                 **kwargs):
        self.eps = eps
        # base-config stats may inject pmin/pmax as None (stats skipped):
        # fall back to the reference defaults
        self.pmin = 1.0 if pmin is None else pmin
        self.pmax = 99.6 if pmax is None else pmax
        self.channelwise = channelwise

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.channelwise:
            axes = tuple(range(1, m.ndim))
            pmin = np.percentile(m, self.pmin, axis=axes, keepdims=True)
            pmax = np.percentile(m, self.pmax, axis=axes, keepdims=True)
        else:
            pmin = np.percentile(m, self.pmin)
            pmax = np.percentile(m, self.pmax)
        return (m - pmin) / (pmax - pmin + self.eps)


class Normalize:
    """Min-max scaling to [-1, 1], or [0, 1] when norm01 is set
    (transforms.py:714-754)."""

    def __init__(self, min_value: float = None, max_value: float = None, norm01: bool = False, eps: float = 1e-10,
                 **kwargs):
        if min_value is not None and max_value is not None:
            assert max_value > min_value
        self.min_value = min_value
        self.max_value = max_value
        self.norm01 = norm01
        self.eps = eps

    def __call__(self, m: np.ndarray) -> np.ndarray:
        min_value = np.min(m) if self.min_value is None else self.min_value
        max_value = np.max(m) if self.max_value is None else self.max_value
        norm_0_1 = (m - min_value) / (max_value - min_value + self.eps)
        if self.norm01:
            return np.clip(norm_0_1, 0, 1)
        return np.clip(2 * norm_0_1 - 1, -1, 1)


class AdditiveGaussianNoise:
    """Adds Gaussian noise with a randomly drawn std (transforms.py:757-776)."""

    def __init__(self, random_state, scale=(0.0, 1.0), execution_probability: float = 0.1, **kwargs):
        self.execution_probability = execution_probability
        self.random_state = random_state
        self.scale = scale

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.random_state.uniform() < self.execution_probability:
            std = self.random_state.uniform(self.scale[0], self.scale[1])
            return m + self.random_state.normal(0, std, size=m.shape)
        return m


class AdditivePoissonNoise:
    """Adds Poisson noise with a randomly drawn rate (transforms.py:779-798)."""

    def __init__(self, random_state, lam=(0.0, 1.0), execution_probability: float = 0.1, **kwargs):
        self.execution_probability = execution_probability
        self.random_state = random_state
        self.lam = lam

    def __call__(self, m: np.ndarray) -> np.ndarray:
        if self.random_state.uniform() < self.execution_probability:
            lam = self.random_state.uniform(self.lam[0], self.lam[1])
            return m + self.random_state.poisson(lam, size=m.shape)
        return m


class GaussianBlur3D:
    """Gaussian blur with a randomly drawn sigma; uses the stdlib `random`
    module (not the paired RandomState), as in the reference
    (transforms.py:890-902)."""

    def __init__(self, sigma=(0.1, 2.0), execution_probability: float = 0.5, **kwargs):
        self.sigma = sigma
        self.execution_probability = execution_probability

    def __call__(self, x: np.ndarray) -> np.ndarray:
        if random.random() < self.execution_probability:
            sigma = random.uniform(self.sigma[0], self.sigma[1])
            return ndimage.gaussian(x, sigma=sigma)
        return x


# ---------------------------------------------------------------------------
# label-engineering transforms
# ---------------------------------------------------------------------------


class StandardLabelToBoundary:
    """Label volume -> binary boundary mask (+ optional foreground / original
    label channels) (transforms.py:338-379)."""

    def __init__(self, ignore_index: int = None, append_label: bool = False, mode: str = "thick",
                 foreground: bool = False, **kwargs):
        self.ignore_index = ignore_index
        self.append_label = append_label
        self.mode = mode
        self.foreground = foreground

    def __call__(self, m: np.ndarray) -> np.ndarray:
        assert m.ndim == 3
        boundaries = ndimage.find_boundaries(m, connectivity=2, mode=self.mode).astype("int32")

        results = []
        if self.foreground:
            foreground = (m > 0).astype("uint8")
            results.append(_recover_ignore_index(foreground, m, self.ignore_index))
        results.append(_recover_ignore_index(boundaries, m, self.ignore_index))
        if self.append_label:
            results.append(m)
        return np.stack(results, axis=0)


class BlobsToMask:
    """Label volume -> binary foreground mask (+ optional boundary / label
    channels) (transforms.py:382-417)."""

    def __init__(self, append_label: bool = False, boundary: bool = False, cross_entropy: bool = False, **kwargs):
        self.cross_entropy = cross_entropy
        self.boundary = boundary
        self.append_label = append_label

    def __call__(self, m):
        assert m.ndim == 3
        mask = (m > 0).astype("uint8")
        results = [mask]

        if self.boundary:
            outer = ndimage.find_boundaries(m, connectivity=2, mode="outer")
            if self.cross_entropy:
                # boundary becomes class 2 in a single channel
                mask[outer > 0] = 2
                results = [mask]
            else:
                results.append(outer)

        if self.append_label:
            results.append(m)
        return np.stack(results, axis=0)


class AbstractLabelToBoundary:
    """Base for affinity-style boundary transforms: boundaries are computed by
    convolving the label volume with +1/-1 offset kernels per axis
    (transforms.py:420-487)."""

    AXES_TRANSPOSE = [
        (0, 1, 2),  # X
        (0, 2, 1),  # Y
        (2, 0, 1),  # Z
    ]

    def __init__(self, ignore_index: int = None, aggregate_affinities: bool = False, append_label: bool = False,
                 **kwargs):
        self.ignore_index = ignore_index
        self.aggregate_affinities = aggregate_affinities
        self.append_label = append_label

    def __call__(self, m: np.ndarray) -> np.ndarray:
        assert m.ndim == 3
        kernels = self.get_kernels()
        channels = np.stack([np.where(np.abs(convolve(m, kernel)) > 0, 1, 0) for kernel in kernels])
        results = []
        if self.aggregate_affinities:
            assert len(kernels) % 3 == 0, "Number of kernels must be divided by 3 (one kernel per offset per Z,Y,X axes"
            # merge affinities of the same offset across Z, Y, X with a logical OR
            for i in range(0, len(kernels), 3):
                aggregated = np.logical_or.reduce(channels[i : i + 3, ...]).astype(np.int32)
                results.append(_recover_ignore_index(aggregated, m, self.ignore_index))
        else:
            results = [_recover_ignore_index(channels[i], m, self.ignore_index) for i in range(channels.shape[0])]

        if self.append_label:
            results.append(m)
        return np.stack(results, axis=0)

    @staticmethod
    def create_kernel(axis, offset: int) -> np.ndarray:
        k_size = offset + 1
        k = np.zeros((1, 1, k_size), dtype=np.int32)
        k[0, 0, 0] = 1
        k[0, 0, offset] = -1
        return np.transpose(k, axis)

    def get_kernels(self):
        raise NotImplementedError


class RandomLabelToAffinities(AbstractLabelToBoundary):
    """Single random-offset affinity channel per call — a boundary-thickness
    denoising scheme (transforms.py:490-521)."""

    def __init__(self, random_state, max_offset=10, ignore_index=None, append_label=False, z_offset_scale=2,
                 **kwargs):
        super().__init__(ignore_index=ignore_index, append_label=append_label, aggregate_affinities=False)
        self.random_state = random_state
        self.offsets = tuple(range(1, max_offset + 1))
        self.z_offset_scale = z_offset_scale

    def get_kernels(self):
        rand_offset = self.random_state.choice(self.offsets)
        axis_ind = self.random_state.randint(3)
        if axis_ind == 2:
            # scale down z-affinities due to anisotropy
            rand_offset = max(1, rand_offset // self.z_offset_scale)
        return [self.create_kernel(self.AXES_TRANSPOSE[axis_ind], rand_offset)]


class LabelToAffinities(AbstractLabelToBoundary):
    """Affinity-graph boundaries for a fixed list of offsets, optionally with
    separate z offsets (transforms.py:524-566)."""

    def __init__(self, offsets, ignore_index=None, append_label=False, aggregate_affinities=False, z_offsets=None,
                 **kwargs):
        super().__init__(ignore_index=ignore_index, append_label=append_label,
                         aggregate_affinities=aggregate_affinities)
        assert isinstance(offsets, (list, tuple)), "offsets must be a list or a tuple"
        assert all(a > 0 for a in offsets), "'offsets' must be positive"
        assert len(set(offsets)) == len(offsets), "'offsets' must be unique"
        if z_offsets is not None:
            assert len(offsets) == len(z_offsets), "z_offsets length must be the same as the length of offsets"
        else:
            z_offsets = list(offsets)
        self.z_offsets = z_offsets

        self.kernels = []
        for xy_offset, z_offset in zip(offsets, z_offsets):
            for axis_ind, axis in enumerate(self.AXES_TRANSPOSE):
                final_offset = z_offset if axis_ind == 2 else xy_offset
                self.kernels.append(self.create_kernel(axis, final_offset))

    def get_kernels(self):
        return self.kernels


class LabelToZAffinities(AbstractLabelToBoundary):
    """Z-axis-only affinities (transforms.py:569-595)."""

    def __init__(self, offsets, ignore_index=None, append_label=False, **kwargs):
        super().__init__(ignore_index=ignore_index, append_label=append_label)
        assert isinstance(offsets, (list, tuple)), "offsets must be a list or a tuple"
        assert all(a > 0 for a in offsets), "'offsets must be positive"
        assert len(set(offsets)) == len(offsets), "'offsets' must be unique"

        z_axis = self.AXES_TRANSPOSE[2]
        self.kernels = [self.create_kernel(z_axis, z_offset) for z_offset in offsets]

    def get_kernels(self):
        return self.kernels


class LabelToBoundaryAndAffinities:
    """Boundary channel(s) + affinity channels in one target
    (transforms.py:598-631)."""

    def __init__(self, xy_offsets, z_offsets, append_label=False, ignore_index=None, mode="thick",
                 foreground=False, **kwargs):
        self.l2b = StandardLabelToBoundary(ignore_index=ignore_index, mode=mode, foreground=foreground)
        self.l2a = LabelToAffinities(offsets=xy_offsets, z_offsets=z_offsets, append_label=append_label,
                                     ignore_index=ignore_index)

    def __call__(self, m: np.ndarray) -> np.ndarray:
        boundary = self.l2b(m)
        affinities = self.l2a(m)
        return np.concatenate((boundary, affinities), axis=0)


class LabelToMaskAndAffinities:
    """Foreground mask channel + affinity channels (transforms.py:634-650)."""

    def __init__(self, xy_offsets, z_offsets, append_label=False, background=0, ignore_index=None, **kwargs):
        self.background = background
        self.l2a = LabelToAffinities(offsets=xy_offsets, z_offsets=z_offsets, append_label=append_label,
                                     ignore_index=ignore_index)

    def __call__(self, m: np.ndarray) -> np.ndarray:
        mask = np.expand_dims((m > self.background).astype(np.uint8), axis=0)
        affinities = self.l2a(m)
        return np.concatenate((mask, affinities), axis=0)


class Relabel:
    """Relabels to consecutive ids, optionally after connected components
    (transforms.py:829-861)."""

    def __init__(self, append_original: bool = False, run_cc: bool = True, ignore_label: int = None, **kwargs):
        self.append_original = append_original
        self.ignore_label = ignore_label
        self.run_cc = run_cc
        if ignore_label is not None:
            assert append_original, (
                "ignore_label present, so append_original must be true, so that one can localize the ignore region"
            )

    def __call__(self, m: np.ndarray) -> np.ndarray:
        orig = m
        if self.run_cc:
            m = ndimage.label(m, background=self.ignore_label)
        result = ndimage.relabel_consecutive(m)
        if self.append_original:
            result = np.stack([result, orig])
        return result


class RgbToLabel:
    """RGB image -> single-channel integer label (transforms.py:872-879)."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        # int64 upfront: numpy 2 (NEP 50) no longer upcasts uint8 * 65536
        img = np.asarray(img).astype(np.int64)
        assert img.ndim == 3 and img.shape[2] == 3
        return img[..., 0] * 65536 + img[..., 1] * 256 + img[..., 2]


class Identity:
    def __init__(self, **kwargs):
        pass

    def __call__(self, m: np.ndarray) -> np.ndarray:
        return m


# ---------------------------------------------------------------------------
# array conversion (the torch ToTensor analog emits typed numpy arrays; the
# host->device transfer happens batched in the loader, not per-patch)
# ---------------------------------------------------------------------------


class ToTensor:
    """Finalizes a patch: optional channel dim, dtype cast, optional 0-1
    normalization. Emits a numpy array (transforms.py:801-826 analog)."""

    def __init__(self, expand_dims: bool, dtype=np.float32, normalize: bool = False, **kwargs):
        self.expand_dims = expand_dims
        self.dtype = dtype
        self.normalize = normalize

    def __call__(self, m: np.ndarray) -> np.ndarray:
        assert m.ndim in [3, 4], "Supports only 3D (DxHxW) or 4D (CxDxHxW) images"
        if self.expand_dims and m.ndim == 3:
            m = np.expand_dims(m, axis=0)
        if self.normalize:
            m = (m - np.min(m)) / (np.max(m) - np.min(m) + 1e-10)
        return np.ascontiguousarray(m, dtype=self.dtype)


class LabelToTensor:
    """Finalizes a label patch as int64 (transforms.py:882-887 analog)."""

    def __call__(self, m: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(np.array(m), dtype="int64")


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------


class Transformer:
    """Builds raw/label transform pipelines from a phase config.

    Every transform in a phase is constructed with a fresh RandomState seeded
    with one shared per-Transformer seed, so geometric transforms consume
    identical random draws for the raw and label pipelines
    (transforms.py:905-934).
    """

    def __init__(self, phase_config: dict, base_config: dict):
        self.phase_config = phase_config
        self.config_base = base_config
        self.seed = GLOBAL_RANDOM_STATE.randint(10000000)

    def raw_transform(self):
        return self._create_transform("raw")

    def label_transform(self):
        return self._create_transform("label")

    @staticmethod
    def _transformer_class(class_name):
        m = importlib.import_module("pytorch3dunet_tpu.augment.transforms")
        return getattr(m, class_name)

    def _create_transform(self, name):
        assert name in self.phase_config, f"Could not find {name} transform"
        return Compose([self._create_augmentation(c) for c in self.phase_config[name]])

    def _create_augmentation(self, c):
        config = dict(self.config_base)
        config.update(c)
        config["random_state"] = np.random.RandomState(self.seed)
        aug_class = self._transformer_class(config["name"])
        return aug_class(**config)
