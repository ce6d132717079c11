"""Tests for the scipy/numpy label-image ops that replace scikit-image."""

import numpy as np
import pytest

from pytorch3dunet_tpu.utils.ndimage import (
    adapted_rand_error,
    contingency_table,
    find_boundaries,
    label,
    label2rgb,
    mean_squared_error,
    peak_signal_noise_ratio,
    rescale_intensity,
)


class TestLabel:
    def test_binary_components(self):
        m = np.zeros((8, 8), dtype=np.uint8)
        m[1:3, 1:3] = 1
        m[5:7, 5:7] = 1
        out, num = label(m, background=0, connectivity=1, return_num=True)
        assert num == 2
        assert len(np.unique(out)) == 3  # bg + 2 components

    def test_multivalue_not_merged(self):
        # two touching regions with different values must stay separate
        m = np.zeros((4, 4), dtype=np.int32)
        m[:, :2] = 1
        m[:, 2:] = 2
        out, num = label(m, return_num=True)
        assert num == 2
        assert len(np.unique(out[:, :2])) == 1
        assert len(np.unique(out[:, 2:])) == 1
        assert out[0, 0] != out[0, 3]

    def test_connectivity(self):
        # diagonal touch: separate under connectivity=1, merged under 2
        m = np.zeros((4, 4), dtype=np.uint8)
        m[0, 0] = 1
        m[1, 1] = 1
        _, num1 = label(m, connectivity=1, return_num=True)
        _, num2 = label(m, connectivity=2, return_num=True)
        assert num1 == 2
        assert num2 == 1

    def test_3d(self):
        m = np.zeros((4, 4, 4), dtype=np.uint8)
        m[0, 0, 0] = 1
        m[3, 3, 3] = 1
        _, num = label(m, connectivity=1, return_num=True)
        assert num == 2


class TestFindBoundaries:
    def test_thick(self):
        m = np.zeros((6, 6), dtype=np.int32)
        m[2:4, 2:4] = 1
        b = find_boundaries(m, connectivity=2, mode="thick")
        # boundary spans both sides of the edge
        assert b[2, 2] and b[1, 1]
        assert not b[0, 0]

    def test_inner(self):
        m = np.zeros((6, 6), dtype=np.int32)
        m[2:4, 2:4] = 1
        b = find_boundaries(m, connectivity=2, mode="inner")
        assert b[2, 2] and not b[1, 1]

    def test_outer(self):
        m = np.zeros((6, 6), dtype=np.int32)
        m[2:4, 2:4] = 1
        b = find_boundaries(m, connectivity=2, mode="outer")
        assert b[1, 1] and not b[2, 2]

    def test_thick_3d(self):
        m = np.zeros((5, 5, 5), dtype=np.int32)
        m[2, 2, 2] = 1
        b = find_boundaries(m, connectivity=2, mode="thick")
        assert b[2, 2, 2] and b[2, 2, 1]
        assert not b[0, 0, 0]


class TestAdaptedRand:
    def test_identical_segmentations(self):
        seg = np.zeros((8, 8, 8), dtype=np.int32)
        seg[:4] = 1
        seg[4:] = 2
        are, prec, rec = adapted_rand_error(seg, seg)
        assert are == pytest.approx(0.0)
        assert prec == pytest.approx(1.0)
        assert rec == pytest.approx(1.0)

    def test_disagreement_increases_error(self):
        gt = np.zeros((8, 8, 8), dtype=np.int32)
        gt[:4] = 1
        gt[4:] = 2
        seg = np.ones_like(gt)  # everything merged into one instance
        are_merged, _, _ = adapted_rand_error(gt, seg)
        assert are_merged > 0.3

    def test_relabeling_invariant(self):
        rs = np.random.RandomState(0)
        gt = rs.randint(0, 4, (6, 6, 6))
        seg = rs.randint(0, 4, (6, 6, 6))
        are1 = adapted_rand_error(gt, seg)[0]
        are2 = adapted_rand_error(gt, seg * 10)[0]
        assert are1 == pytest.approx(are2)


class TestContingency:
    def test_counts(self):
        gt = np.array([[0, 0], [1, 1]])
        seg = np.array([[0, 1], [1, 1]])
        table = contingency_table(gt, seg).toarray()
        assert table[0, 0] == 1
        assert table[0, 1] == 1
        assert table[1, 1] == 2


class TestImageMetrics:
    def test_mse(self):
        a = np.zeros((4, 4))
        b = np.ones((4, 4)) * 2
        assert mean_squared_error(a, b) == pytest.approx(4.0)

    def test_psnr_float(self):
        a = np.random.RandomState(0).rand(8, 8)
        noise = a + 0.01
        assert peak_signal_noise_ratio(a, noise) > 30

    def test_rescale_intensity(self):
        m = np.array([2.0, 4.0, 6.0])
        out = rescale_intensity(m, out_range=(0, 1))
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0])

    def test_label2rgb_shape(self):
        m = np.array([[0, 1], [2, 1]])
        rgb = label2rgb(m)
        assert rgb.shape == (2, 2, 3)
        assert np.all(rgb[0, 0] == 0)  # background is black
        assert np.any(rgb[0, 1] > 0)
