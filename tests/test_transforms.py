"""Augmentation pipeline tests.

Mirrors the reference test strategy (tests/test_transforms.py): affinity /
boundary channel counts, ignore-index recovery, Relabel, the Transformer
factory wiring, CropToFixed determinism via seeded twin RNGs, and gamma
darkening.
"""

import numpy as np

from pytorch3dunet_tpu.augment.transforms import (
    BlobsToMask,
    CropToFixed,
    ElasticDeformation,
    LabelToAffinities,
    LabelToBoundaryAndAffinities,
    LabelToZAffinities,
    RandomFlip,
    RandomGammaCorrection,
    RandomLabelToAffinities,
    RandomRotate90,
    Relabel,
    StandardLabelToBoundary,
    Standardize,
    Transformer,
)


def _label_volume(shape=(16, 32, 32), n=4, seed=0):
    return np.random.RandomState(seed).randint(0, n, shape)


class TestLabelEngineering:
    def test_label_to_affinities_channels(self):
        m = _label_volume()
        t = LabelToAffinities(offsets=[1, 2], aggregate_affinities=False)
        out = t(m)
        assert out.shape[0] == 6  # 2 offsets x 3 axes

    def test_label_to_affinities_aggregated(self):
        m = _label_volume()
        t = LabelToAffinities(offsets=[1, 2], aggregate_affinities=True)
        out = t(m)
        assert out.shape[0] == 2  # one aggregated channel per offset

    def test_label_to_z_affinities(self):
        m = _label_volume()
        t = LabelToZAffinities(offsets=[1, 3])
        out = t(m)
        assert out.shape[0] == 2

    def test_random_label_to_affinities(self):
        m = _label_volume()
        t = RandomLabelToAffinities(random_state=np.random.RandomState(0), max_offset=4)
        out = t(m)
        assert out.shape[0] == 1

    def test_append_label(self):
        m = _label_volume()
        t = LabelToAffinities(offsets=[1], append_label=True)
        out = t(m)
        assert out.shape[0] == 4  # 3 affinity channels + label
        np.testing.assert_array_equal(out[-1], m)

    def test_ignore_index_recovery(self):
        m = _label_volume()
        m[0, 0, 0] = -1
        t = LabelToAffinities(offsets=[1], ignore_index=-1)
        out = t(m)
        assert (out[:, 0, 0, 0] == -1).all()

    def test_standard_label_to_boundary(self):
        m = _label_volume()
        out = StandardLabelToBoundary()(m)
        assert out.shape == (1, *m.shape)
        assert set(np.unique(out)).issubset({0, 1})

    def test_boundary_with_foreground(self):
        m = _label_volume()
        out = StandardLabelToBoundary(foreground=True)(m)
        assert out.shape == (2, *m.shape)

    def test_boundary_and_affinities(self):
        m = _label_volume()
        t = LabelToBoundaryAndAffinities(xy_offsets=[1, 2], z_offsets=[1, 1])
        out = t(m)
        assert out.shape[0] == 1 + 6

    def test_blobs_to_mask(self):
        m = _label_volume()
        out = BlobsToMask()(m)
        assert out.shape == (1, *m.shape)
        np.testing.assert_array_equal(out[0], (m > 0).astype(np.uint8))

    def test_relabel(self):
        m = np.array([10, 10, 0, 6, 6]).reshape(1, 1, 5)
        out = Relabel(run_cc=False)(m)
        assert set(np.unique(out)) == {0, 1, 2}


class TestGeometric:
    def test_paired_flip_consistency(self):
        m = np.random.rand(8, 16, 16)
        seed = 123
        t_raw = RandomFlip(np.random.RandomState(seed))
        t_label = RandomFlip(np.random.RandomState(seed))
        np.testing.assert_array_equal(t_raw(m.copy()), t_label(m.copy()))

    def test_paired_rotate90_consistency(self):
        m = np.random.rand(8, 16, 16)
        seed = 7
        t_raw = RandomRotate90(np.random.RandomState(seed))
        t_label = RandomRotate90(np.random.RandomState(seed))
        np.testing.assert_array_equal(t_raw(m.copy()), t_label(m.copy()))

    def test_rotate90_preserves_z(self):
        m = np.random.rand(8, 16, 16)
        out = RandomRotate90(np.random.RandomState(0))(m)
        assert out.shape[0] == 8

    def test_flip_4d_matches_3d_channels(self):
        m = np.random.rand(2, 8, 16, 16)
        seed = 5
        out4d = RandomFlip(np.random.RandomState(seed))(m.copy())
        out_c0 = RandomFlip(np.random.RandomState(seed))(m[0].copy())
        np.testing.assert_array_equal(out4d[0], out_c0)

    def test_elastic_deformation_paired(self):
        m = np.random.rand(8, 32, 32)
        seed = 11
        t1 = ElasticDeformation(np.random.RandomState(seed), spline_order=0, execution_probability=1.0)
        t2 = ElasticDeformation(np.random.RandomState(seed), spline_order=0, execution_probability=1.0)
        np.testing.assert_array_equal(t1(m.copy()), t2(m.copy()))

    def test_elastic_deformation_changes_input(self):
        m = np.random.rand(8, 32, 32)
        t = ElasticDeformation(np.random.RandomState(0), spline_order=3, execution_probability=1.0)
        out = t(m.copy())
        assert out.shape == m.shape
        assert not np.allclose(out, m)

    def test_crop_to_fixed_deterministic(self):
        m = np.random.rand(4, 100, 120)
        seed = 3
        out1 = CropToFixed(np.random.RandomState(seed), size=(64, 64))(m)
        out2 = CropToFixed(np.random.RandomState(seed), size=(64, 64))(m)
        assert out1.shape == (4, 64, 64)
        np.testing.assert_array_equal(out1, out2)

    def test_crop_to_fixed_pads_when_bigger(self):
        m = np.random.rand(4, 32, 32)
        out = CropToFixed(np.random.RandomState(0), size=(64, 64))(m)
        assert out.shape == (4, 64, 64)


class TestIntensity:
    def test_standardize(self):
        m = np.random.rand(8, 16, 16) * 10 + 5
        out = Standardize()(m)
        assert abs(out.mean()) < 1e-6
        assert abs(out.std() - 1) < 1e-5

    def test_gamma_darkens(self):
        m = np.random.rand(8, 16, 16)
        t = RandomGammaCorrection(np.random.RandomState(0), gamma=(3.0, 3.0), execution_probability=1.0)
        out = t(m.copy())
        # gamma > 1 darkens a [0,1] image
        assert out.mean() < m.mean()


class TestTransformerFactory:
    def test_pipelines_share_seed(self, transformer_config):
        phase_cfg = transformer_config["train"]["transformer"]
        stats = {"pmin": None, "pmax": None, "mean": None, "std": None}
        transformer = Transformer(phase_cfg, stats)
        raw_t = transformer.raw_transform()
        label_t = transformer.label_transform()

        m = np.random.rand(8, 32, 32)
        out_raw = np.asarray(raw_t(m.copy()))
        out_label = np.asarray(label_t(m.copy()))
        np.testing.assert_allclose(out_raw, out_label, rtol=1e-6)

    def test_test_phase_pipeline(self, transformer_config):
        phase_cfg = transformer_config["test"]["transformer"]
        stats = {"pmin": None, "pmax": None, "mean": None, "std": None}
        transformer = Transformer(phase_cfg, stats)
        raw_t = transformer.raw_transform()
        m = np.random.rand(8, 32, 32)
        out = raw_t(m)
        assert out.shape == (1, 8, 32, 32)
        assert out.dtype == np.float32
