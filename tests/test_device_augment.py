"""On-device augmentation ops: paired-key consistency + semantic checks."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3dunet_tpu.ops.augment import (
    additive_gaussian_noise,
    additive_poisson_noise,
    elastic_deformation,
    gaussian_blur,
    paired_geometric,
    random_contrast,
    random_flip,
    random_rotate90,
)


def _vol(c=1, seed=0, side=16):
    return jnp.asarray(np.random.RandomState(seed).rand(8, side, side, c), dtype=jnp.float32)


class TestPairedConsistency:
    def test_flip_same_key(self):
        x = _vol()
        k = jax.random.PRNGKey(3)
        np.testing.assert_array_equal(np.asarray(random_flip(k, x)), np.asarray(random_flip(k, x)))

    def test_flip_changes_with_key(self):
        x = _vol()
        outs = {np.asarray(random_flip(jax.random.PRNGKey(i), x)).tobytes() for i in range(8)}
        assert len(outs) > 1

    def test_rot90_same_key(self):
        x = _vol()
        k = jax.random.PRNGKey(5)
        np.testing.assert_array_equal(np.asarray(random_rotate90(k, x)), np.asarray(random_rotate90(k, x)))

    def test_paired_geometric_raw_label_match(self):
        vol = np.random.RandomState(1).rand(8, 16, 16, 1).astype(np.float32)
        raw, label = jnp.asarray(vol), jnp.asarray(vol)
        out_raw, out_label = paired_geometric(jax.random.PRNGKey(9), raw, label)
        np.testing.assert_array_equal(np.asarray(out_raw), np.asarray(out_label))

    def test_elastic_paired(self):
        vol = np.random.RandomState(2).rand(8, 16, 16, 1).astype(np.float32)
        k = jax.random.PRNGKey(11)
        a = elastic_deformation(k, jnp.asarray(vol), spline_order=0, execution_probability=1.0,
                                alpha=100, sigma=8)
        b = elastic_deformation(k, jnp.asarray(vol), spline_order=0, execution_probability=1.0,
                                alpha=100, sigma=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


    def test_elastic_amplitude_matches_host_formula(self):
        # deforming a z-coordinate ramp exposes the displacement field:
        # output - ramp == dz. Its std must match the HOST ElasticDeformation
        # amplitude alpha*(2*sqrt(pi)*sigma)^(-3/2) (sum-1 Gaussian smoothing
        # of unit noise) — the coarse-grid field is gd^1.5 stronger before
        # the calibration in ops/augment.py.
        D = 64
        alpha, sigma = 500.0, 10.0
        ramp = np.broadcast_to(np.arange(D, dtype=np.float32)[:, None, None], (D, D, D)).copy()
        out = elastic_deformation(jax.random.PRNGKey(3), jnp.asarray(ramp)[..., None],
                                  spline_order=1, alpha=alpha, sigma=sigma,
                                  execution_probability=1.0, grid_downsample=4)
        dz = np.asarray(out)[..., 0] - ramp
        inner = dz[12:-12, 12:-12, 12:-12]  # border reflection distorts edges
        host_std = alpha * (2 * np.sqrt(np.pi) * sigma) ** -1.5
        assert 0.5 * host_std < inner.std() < 2.0 * host_std, (inner.std(), host_std)


class TestSemantics:
    def test_flip_is_volume_preserving(self):
        x = _vol()
        y = random_flip(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(float(jnp.sum(x)), float(jnp.sum(y)), rtol=1e-5)

    def test_rot90_shape(self):
        x = _vol()
        y = random_rotate90(jax.random.PRNGKey(1), x)
        assert y.shape == x.shape

    def test_contrast_clips(self):
        x = _vol() * 3
        y = random_contrast(jax.random.PRNGKey(0), x, execution_probability=1.0)
        assert float(jnp.max(y)) <= 1.0

    def test_gaussian_noise_changes(self):
        x = _vol()
        y = additive_gaussian_noise(jax.random.PRNGKey(0), x, scale=(0.5, 0.5), execution_probability=1.0)
        assert not np.allclose(np.asarray(x), np.asarray(y))

    def test_poisson_noise_nonnegative_increment(self):
        x = _vol()
        y = additive_poisson_noise(jax.random.PRNGKey(0), x, lam=(3.0, 3.0), execution_probability=1.0)
        assert float(jnp.min(y - x)) >= 0

    def test_blur_smooths(self):
        x = _vol()
        y = gaussian_blur(jax.random.PRNGKey(0), x, sigma=(2.0, 2.0), execution_probability=1.0)
        assert float(jnp.std(y)) < float(jnp.std(x))
        assert abs(float(jnp.mean(y)) - float(jnp.mean(x))) < 0.02

    def test_elastic_deforms(self):
        x = _vol(side=32)
        y = elastic_deformation(jax.random.PRNGKey(0), x, spline_order=1, execution_probability=1.0,
                                alpha=200, sigma=8)
        assert y.shape == x.shape
        assert not np.allclose(np.asarray(x), np.asarray(y))

    def test_elastic_label_values_preserved(self):
        # order-0 resampling must not invent new label values
        lab = np.random.RandomState(0).randint(0, 4, (8, 32, 32, 1)).astype(np.float32)
        y = elastic_deformation(jax.random.PRNGKey(2), jnp.asarray(lab), spline_order=0,
                                execution_probability=1.0, alpha=200, sigma=8)
        assert set(np.unique(np.asarray(y))).issubset(set(np.unique(lab)))

    def test_jit_compatible(self):
        x = _vol()

        @jax.jit
        def pipeline(key, x):
            k1, k2, k3 = jax.random.split(key, 3)
            x = random_flip(k1, x)
            x = random_rotate90(k2, x)
            return additive_gaussian_noise(k3, x, execution_probability=1.0)

        y = pipeline(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape


class TestRandomRotate:
    def test_same_key_deterministic(self):
        from pytorch3dunet_tpu.ops.augment import random_rotate

        x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 1).astype(np.float32))
        a = random_rotate(jax.random.PRNGKey(3), x, ((2, 1),), 45, 1)
        b = random_rotate(jax.random.PRNGKey(3), x, ((2, 1),), 45, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_paired_label_follows_raw(self):
        from pytorch3dunet_tpu.ops.augment import random_rotate

        # binary blob: rotating raw (order 1) and label (order 0) with the
        # same key keeps the supports overlapping almost everywhere
        vol = np.zeros((8, 24, 24, 1), np.float32)
        vol[2:6, 8:16, 8:16] = 1.0
        key = jax.random.PRNGKey(11)
        raw = np.asarray(random_rotate(key, jnp.asarray(vol), ((2, 1),), 45, 1))
        lab = np.asarray(random_rotate(key, jnp.asarray(vol), ((2, 1),), 45, 0))
        inter = np.logical_and(raw > 0.5, lab > 0.5).sum()
        union = np.logical_or(raw > 0.5, lab > 0.5).sum()
        assert inter / union > 0.85

    def test_rotation_moves_mass(self):
        from pytorch3dunet_tpu.ops.augment import random_rotate

        vol = np.zeros((4, 20, 20, 1), np.float32)
        vol[:, 2:6, 9:11] = 1.0  # off-center bar
        out = np.asarray(random_rotate(jax.random.PRNGKey(1), jnp.asarray(vol), ((2, 1),), 45, 1))
        assert not np.allclose(out, vol)
        # interpolation preserves total mass approximately
        assert abs(out.sum() - vol.sum()) / vol.sum() < 0.15


class TestCubicMapCoordinates:
    def test_matches_scipy_order3_reflect(self):
        from scipy.ndimage import map_coordinates as scipy_mc

        from pytorch3dunet_tpu.ops.augment import map_coordinates_cubic

        rs = np.random.RandomState(0)
        vol = rs.rand(12, 18, 14).astype(np.float32)
        # arbitrary sampling positions, including out-of-bounds excursions
        coords = [rs.uniform(-3, s + 2, size=(400,)).astype(np.float32) for s in vol.shape]
        ref = scipy_mc(vol.astype(np.float64), np.stack(coords), order=3, mode="reflect")
        ours = np.asarray(map_coordinates_cubic(jnp.asarray(vol), [jnp.asarray(c) for c in coords]))
        np.testing.assert_allclose(ours, ref, atol=5e-6)

    def test_identity_at_nodes(self):
        from pytorch3dunet_tpu.ops.augment import map_coordinates_cubic

        vol = np.random.RandomState(1).rand(6, 7, 8).astype(np.float32)
        grids = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in vol.shape], indexing="ij")
        out = np.asarray(map_coordinates_cubic(jnp.asarray(vol), [jnp.asarray(g) for g in grids]))
        np.testing.assert_allclose(out, vol, atol=2e-6)


class TestElasticOrder3:
    def test_order3_runs_and_differs_from_order1(self):
        x = _vol(side=24)
        k = jax.random.PRNGKey(7)
        o1 = np.asarray(elastic_deformation(k, x, spline_order=1, execution_probability=1.0))
        o3 = np.asarray(elastic_deformation(k, x, spline_order=3, execution_probability=1.0))
        assert o1.shape == o3.shape == x.shape
        assert not np.allclose(o1, np.asarray(x))
        # same displacement field, different interpolants: close but not equal
        assert np.abs(o1 - o3).max() > 1e-5
        assert np.abs(o1 - o3).mean() < 0.05

    def test_order3_raw_pairs_with_order0_label(self):
        vol = np.zeros((8, 24, 24, 1), np.float32)
        vol[2:6, 6:18, 6:18] = 1.0
        k = jax.random.PRNGKey(9)
        kwargs = dict(alpha=300.0, sigma=12.0, execution_probability=1.0)
        raw = np.asarray(elastic_deformation(k, jnp.asarray(vol), spline_order=3, **kwargs))
        lab = np.asarray(elastic_deformation(k, jnp.asarray(vol), spline_order=0, **kwargs))
        inter = np.logical_and(raw > 0.5, lab > 0.5).sum()
        union = np.logical_or(raw > 0.5, lab > 0.5).sum()
        assert inter / union > 0.85


class TestDeviceLabelEngineering:
    def test_thick_boundary_matches_host(self):
        from pytorch3dunet_tpu.ops.augment import thick_boundary
        from pytorch3dunet_tpu.utils import ndimage

        rs = np.random.RandomState(0)
        # blobby integer label volume (distinct touching regions + background)
        lab = (rs.rand(12, 20, 20) > 0.6).astype(np.int64)
        lab[4:8, 5:12, 5:12] = 2
        lab[:, 14:, 14:] = 3
        host = ndimage.find_boundaries(lab, connectivity=2, mode="thick")
        dev = np.asarray(thick_boundary(jnp.asarray(lab)))
        np.testing.assert_array_equal(dev, host)

    def test_standard_label_to_boundary_matches_host_transform(self):
        from pytorch3dunet_tpu.augment.transforms import StandardLabelToBoundary
        from pytorch3dunet_tpu.ops.augment import standard_label_to_boundary

        rs = np.random.RandomState(1)
        lab = rs.randint(0, 4, size=(8, 16, 16)).astype(np.int64)
        host = StandardLabelToBoundary(append_label=True, foreground=True)(lab)  # (C, D, H, W)
        dev = np.asarray(standard_label_to_boundary(jnp.asarray(lab), append_label=True, foreground=True))
        np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32))

    def test_blobs_to_mask_matches_host_transform(self):
        from pytorch3dunet_tpu.augment.transforms import BlobsToMask
        from pytorch3dunet_tpu.ops.augment import blobs_to_mask

        rs = np.random.RandomState(2)
        lab = rs.randint(0, 3, size=(8, 16, 16)).astype(np.int64)
        host = BlobsToMask(append_label=True)(lab)
        dev = np.asarray(blobs_to_mask(jnp.asarray(lab), append_label=True))
        np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32))

    def test_split_moves_label_engineering(self):
        from pytorch3dunet_tpu.ops.augment import split_device_transforms

        loaders = {
            "device_augment": True,
            "train": {"transformer": {
                "raw": [{"name": "Standardize"}, {"name": "RandomFlip"},
                        {"name": "ToTensor", "expand_dims": True}],
                "label": [{"name": "RandomFlip"},
                          {"name": "StandardLabelToBoundary", "append_label": True},
                          {"name": "ToTensor", "expand_dims": False}],
            }},
        }
        spec = split_device_transforms(loaders)
        assert spec["label_post"]["name"] == "StandardLabelToBoundary"
        # the host label pipeline shrinks to ToTensor with forced channel dim
        assert loaders["train"]["transformer"]["label"] == [
            {"name": "ToTensor", "expand_dims": True}]

    def test_split_keeps_unsupported_engineering_on_host(self):
        from pytorch3dunet_tpu.ops.augment import split_device_transforms

        loaders = {
            "device_augment": True,
            "train": {"transformer": {
                "raw": [{"name": "RandomFlip"}, {"name": "ToTensor", "expand_dims": True}],
                # Relabel has no device kernel: the whole tail stays host-side
                "label": [{"name": "RandomFlip"}, {"name": "Relabel"},
                          {"name": "BlobsToMask", "append_label": True},
                          {"name": "ToTensor", "expand_dims": False}],
            }},
        }
        spec = split_device_transforms(loaders)
        assert spec["label_post"] is None
        names = [t["name"] for t in loaders["train"]["transformer"]["label"]]
        assert names == ["Relabel", "BlobsToMask", "ToTensor"]

    def test_augmenter_emits_engineered_channels(self):
        from pytorch3dunet_tpu.ops.augment import DeviceAugmenter, split_device_transforms

        loaders = {
            "device_augment": True,
            "train": {"transformer": {
                "raw": [{"name": "RandomFlip"}, {"name": "ToTensor", "expand_dims": True}],
                "label": [{"name": "RandomFlip"},
                          {"name": "StandardLabelToBoundary", "append_label": True},
                          {"name": "ToTensor", "expand_dims": False}],
            }},
        }
        spec = split_device_transforms(loaders)
        aug = DeviceAugmenter(spec)
        rs = np.random.RandomState(3)
        raw = jnp.asarray(rs.rand(2, 8, 16, 16, 1).astype(np.float32))
        label = jnp.asarray(rs.randint(0, 3, size=(2, 8, 16, 16, 1)).astype(np.float32))
        out_raw, out_label = aug(jax.random.PRNGKey(0), raw, label)
        assert out_raw.shape == raw.shape
        # boundary + appended label = 2 channels
        assert out_label.shape == (2, 8, 16, 16, 2)
        assert set(np.unique(np.asarray(out_label[..., 0]))) <= {0.0, 1.0}

    def test_split_keeps_engineering_when_to_tensor_carries_options(self):
        from pytorch3dunet_tpu.ops.augment import split_device_transforms

        # normalize/dtype-carrying ToTensor must keep the engineering on host
        # (once moved, ToTensor would run on the RAW label instead of the
        # engineered stack and silently change the targets)
        for tt in ({"name": "ToTensor", "expand_dims": False, "normalize": True},
                   {"name": "ToTensor", "expand_dims": False, "dtype": "int64"}):
            loaders = {
                "device_augment": True,
                "train": {"transformer": {
                    "raw": [{"name": "RandomFlip"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "RandomFlip"},
                              {"name": "StandardLabelToBoundary", "append_label": True}, dict(tt)],
                }},
            }
            spec = split_device_transforms(loaders)
            assert spec["label_post"] is None
            names = [t["name"] for t in loaders["train"]["transformer"]["label"]]
            assert names == ["StandardLabelToBoundary", "ToTensor"]

    def test_thick_boundary_keeps_large_integer_ids(self):
        from pytorch3dunet_tpu.ops.augment import thick_boundary

        # adjacent ids 2^24 and 2^24+1 are equal in float32; the boundary
        # between them must still be detected (integer comparison path)
        lab = np.full((4, 8, 8), 2**24, dtype=np.int64)
        lab[:, :, 4:] = 2**24 + 1
        out = np.asarray(thick_boundary(jnp.asarray(lab)))
        assert out[:, :, 3:5].all() and not out[:, :, :3].any()

class TestDeviceAffinities:
    """Device affinity kernels vs the host transforms (which are themselves
    oracle-tested against the live reference)."""

    @staticmethod
    def _label(seed=5, shape=(9, 15, 17)):
        return np.random.RandomState(seed).randint(0, 5, size=shape).astype(np.int64)

    def test_label_to_affinities_matches_host(self):
        from pytorch3dunet_tpu.augment.transforms import LabelToAffinities
        from pytorch3dunet_tpu.ops.augment import label_to_affinities

        lab = self._label()
        for kwargs in (
            dict(offsets=[1, 2, 4]),
            dict(offsets=[1, 3], z_offsets=[1, 2]),
            dict(offsets=[2, 4], aggregate_affinities=True),
            dict(offsets=[1], append_label=True),
            dict(offsets=[1, 2], ignore_index=0),
        ):
            host = LabelToAffinities(**kwargs)(lab)
            dev = np.asarray(label_to_affinities(jnp.asarray(lab), **kwargs))
            np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32), err_msg=str(kwargs))

    def test_label_to_z_affinities_matches_host(self):
        from pytorch3dunet_tpu.augment.transforms import LabelToZAffinities
        from pytorch3dunet_tpu.ops.augment import label_to_z_affinities

        lab = self._label(6)
        for kwargs in (dict(offsets=[1, 2, 3]), dict(offsets=[2], append_label=True),
                       dict(offsets=[1, 4], ignore_index=0)):
            host = LabelToZAffinities(**kwargs)(lab)
            dev = np.asarray(label_to_z_affinities(jnp.asarray(lab), **kwargs))
            np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32), err_msg=str(kwargs))

    def test_label_to_boundary_and_affinities_matches_host(self):
        from pytorch3dunet_tpu.augment.transforms import LabelToBoundaryAndAffinities
        from pytorch3dunet_tpu.ops.augment import label_to_boundary_and_affinities

        lab = self._label(7)
        for kwargs in (dict(xy_offsets=[1, 2], z_offsets=[1, 1]),
                       dict(xy_offsets=[2], z_offsets=[1], append_label=True, foreground=True)):
            host = LabelToBoundaryAndAffinities(**kwargs)(lab)
            dev = np.asarray(label_to_boundary_and_affinities(jnp.asarray(lab), **kwargs))
            np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32), err_msg=str(kwargs))

    def test_label_to_mask_and_affinities_matches_host(self):
        from pytorch3dunet_tpu.augment.transforms import LabelToMaskAndAffinities
        from pytorch3dunet_tpu.ops.augment import label_to_mask_and_affinities

        lab = self._label(8)
        for kwargs in (dict(xy_offsets=[1, 3], z_offsets=[1, 2]),
                       dict(xy_offsets=[1], z_offsets=[1], background=1)):
            host = LabelToMaskAndAffinities(**kwargs)(lab)
            dev = np.asarray(label_to_mask_and_affinities(jnp.asarray(lab), **kwargs))
            np.testing.assert_array_equal(np.moveaxis(dev, -1, 0), host.astype(np.float32), err_msg=str(kwargs))

    def test_random_label_to_affinities_is_a_valid_host_draw(self):
        """Each keyed device draw must equal the host transform for SOME
        (axis, offset) in its support — same family, device-PRNG stream."""
        from pytorch3dunet_tpu.augment.transforms import AbstractLabelToBoundary
        from pytorch3dunet_tpu.ops.augment import random_label_to_affinities

        lab = self._label(9, shape=(8, 12, 12))
        max_offset, z_scale = 6, 2

        class _OneKernel(AbstractLabelToBoundary):
            def __init__(self, axis_ind, offset):
                super().__init__()
                self._k = [self.create_kernel(self.AXES_TRANSPOSE[axis_ind], offset)]

            def get_kernels(self):
                return self._k

        support = []
        for axis_ind in range(3):
            for off in range(1, max_offset + 1):
                o = max(1, off // z_scale) if axis_ind == 2 else off
                support.append(_OneKernel(axis_ind, o)(lab).astype(np.float32))

        for seed in range(4):
            dev = np.moveaxis(np.asarray(random_label_to_affinities(
                jax.random.PRNGKey(seed), jnp.asarray(lab), max_offset=max_offset,
                z_offset_scale=z_scale)), -1, 0)
            assert any(np.array_equal(dev, h) for h in support), f"seed {seed} not in host support"


class TestEngineeringAfterGeometry:
    """Ordering equivalence: the device pipeline computes label engineering
    AFTER the geometric transforms — engineering(flip(label)), exactly as the
    reference host pipeline orders it. axis_prob=0 makes RandomFlip flip all
    three axes deterministically on host and device alike."""

    CASES = [
        ({"name": "StandardLabelToBoundary", "append_label": True}, "StandardLabelToBoundary"),
        ({"name": "BlobsToMask"}, "BlobsToMask"),
        ({"name": "LabelToAffinities", "offsets": [1, 2]}, "LabelToAffinities"),
        ({"name": "LabelToZAffinities", "offsets": [1, 2]}, "LabelToZAffinities"),
        ({"name": "LabelToBoundaryAndAffinities", "xy_offsets": [1, 2], "z_offsets": [1, 1]},
         "LabelToBoundaryAndAffinities"),
        ({"name": "LabelToMaskAndAffinities", "xy_offsets": [1], "z_offsets": [1]},
         "LabelToMaskAndAffinities"),
    ]

    def test_each_movable_engineering_sees_the_transformed_label(self):
        import pytorch3dunet_tpu.augment.transforms as T
        from pytorch3dunet_tpu.ops.augment import DeviceAugmenter, split_device_transforms

        rs = np.random.RandomState(11)
        lab_np = rs.randint(0, 4, size=(8, 12, 12)).astype(np.float32)
        raw = jnp.asarray(rs.rand(1, 8, 12, 12, 1).astype(np.float32))
        label = jnp.asarray(lab_np[None, ..., None])

        for eng_cfg, host_name in self.CASES:
            loaders = {
                "device_augment": True,
                "train": {"transformer": {
                    "raw": [{"name": "RandomFlip", "axis_prob": 0.0},
                            {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "RandomFlip", "axis_prob": 0.0}, dict(eng_cfg),
                              {"name": "ToTensor", "expand_dims": False}],
                }},
            }
            spec = split_device_transforms(loaders)
            assert spec["label_post"]["name"] == eng_cfg["name"]
            out_raw, out_label = DeviceAugmenter(spec)(jax.random.PRNGKey(0), raw, label)

            host_cls = getattr(T, host_name)
            kwargs = {k: v for k, v in eng_cfg.items() if k != "name"}
            expected = host_cls(**kwargs)(np.flip(lab_np, (0, 1, 2)))  # engineering AFTER the flip
            np.testing.assert_array_equal(
                np.moveaxis(np.asarray(out_label[0]), -1, 0), expected.astype(np.float32),
                err_msg=host_name)
            np.testing.assert_array_equal(np.asarray(out_raw[0]), np.flip(np.asarray(raw[0]), (0, 1, 2)))


class TestOrderGuard:
    def test_elastic_and_rotate_stay_on_host_with_unmovable_engineering(self, caplog):
        from pytorch3dunet_tpu.ops.augment import split_device_transforms

        loaders = {
            "device_augment": True,
            "train": {"transformer": {
                "raw": [{"name": "RandomFlip"}, {"name": "RandomRotate"},
                        {"name": "ElasticDeformation", "spline_order": 3},
                        {"name": "ToTensor", "expand_dims": True}],
                # Relabel has no device kernel: elastic/rotate must NOT be
                # reordered after it (deformed-boundary != boundary-of-deformed)
                "label": [{"name": "RandomFlip"}, {"name": "RandomRotate"},
                          {"name": "ElasticDeformation", "spline_order": 0},
                          {"name": "Relabel"},
                          {"name": "BlobsToMask"},
                          {"name": "ToTensor", "expand_dims": False}],
            }},
        }
        import logging
        with caplog.at_level(logging.WARNING):
            spec = split_device_transforms(loaders)
        assert spec["label_post"] is None
        # flips still move; elastic + rotate stay paired on the HOST pipeline
        assert [p["raw"]["name"] for p in spec["paired"]] == ["RandomFlip"]
        raw_names = [t["name"] for t in loaders["train"]["transformer"]["raw"]]
        label_names = [t["name"] for t in loaders["train"]["transformer"]["label"]]
        assert raw_names == ["RandomRotate", "ElasticDeformation", "ToTensor"]
        assert label_names == ["RandomRotate", "ElasticDeformation", "Relabel", "BlobsToMask", "ToTensor"]
        assert any("no device kernel" in r.message for r in caplog.records)

    def test_affinity_engineering_now_moves_with_elastic(self):
        """The lightsheet-style recipe: affinity engineering has a device
        kernel, so the guard does not fire and the whole pipeline moves."""
        from pytorch3dunet_tpu.ops.augment import split_device_transforms

        loaders = {
            "device_augment": True,
            "train": {"transformer": {
                "raw": [{"name": "ElasticDeformation", "spline_order": 3},
                        {"name": "ToTensor", "expand_dims": True}],
                "label": [{"name": "ElasticDeformation", "spline_order": 0},
                          {"name": "LabelToBoundaryAndAffinities",
                           "xy_offsets": [1], "z_offsets": [1]},
                          {"name": "ToTensor", "expand_dims": False}],
            }},
        }
        spec = split_device_transforms(loaders)
        assert spec["label_post"]["name"] == "LabelToBoundaryAndAffinities"
        assert [p["raw"]["name"] for p in spec["paired"]] == ["ElasticDeformation"]
        assert loaders["train"]["transformer"]["raw"] == [{"name": "ToTensor", "expand_dims": True}]
        assert loaders["train"]["transformer"]["label"] == [{"name": "ToTensor", "expand_dims": True}]
