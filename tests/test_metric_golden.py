"""Golden-threshold metric tests on synthetic data.

Mirrors the reference's accuracy gates (tests/test_criterion.py:81-120):
AP == 1.0 on a synthetic instance grid; boundary metrics recover a clean
synthetic segmentation (ARand ~ 0, AP ~ 1).
"""

import numpy as np
import pytest

from pytorch3dunet_tpu.metrics import (
    BlobsAveragePrecision,
    BoundaryAdaptedRandError,
    BoundaryAveragePrecision,
    GenericAveragePrecision,
)
from pytorch3dunet_tpu.seg_metrics import Accuracy, AveragePrecision
from pytorch3dunet_tpu.utils.ndimage import find_boundaries


def _instance_grid(shape=(16, 48, 48), cell=8):
    """Synthetic instance segmentation: a 3D checkerboard of labeled cells."""
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    return (
        (zz // cell) * 100 + (yy // cell) * 10 + (xx // cell) + 1
    ).astype(np.int64)


class TestSyntheticGolden:
    def test_average_precision_perfect(self):
        seg = _instance_grid()
        assert AveragePrecision()(seg, seg) == pytest.approx(1.0)

    def test_accuracy_perfect(self):
        seg = _instance_grid()
        assert Accuracy(iou_threshold=0.5)(seg, seg) == pytest.approx(1.0)

    def test_average_precision_degrades(self):
        seg = _instance_grid()
        merged = np.ones_like(seg)  # all instances merged
        assert AveragePrecision()(merged, seg) < 0.2

    def test_boundary_adapted_rand_on_clean_boundaries(self):
        """A perfect boundary map must reconstruct the segmentation: ARand ~ 0."""
        # thick boundaries consume 2 voxels per edge; large cells keep the
        # boundary fraction realistic
        gt = _instance_grid(shape=(8, 64, 64), cell=32)
        boundary = find_boundaries(gt, connectivity=2, mode="thick").astype(np.float32)

        # input: (N, C, D, H, W) boundary pmaps; target: last channel = gt instances
        inp = boundary[None, None]
        target = np.stack([boundary, gt.astype(np.float32)], axis=0)[None]

        metric = BoundaryAdaptedRandError(thresholds=[0.5], use_last_target=True)
        arand = metric(inp, target)
        assert arand < 0.1

    def test_boundary_average_precision_on_clean_boundaries(self):
        gt = _instance_grid(shape=(8, 64, 64), cell=32)
        boundary = find_boundaries(gt, connectivity=2, mode="thick").astype(np.float32)
        inp = boundary[None, None]
        target = np.stack([boundary, gt.astype(np.float32)], axis=0)[None]

        metric = BoundaryAveragePrecision(thresholds=[0.5])
        ap = metric(inp, target)
        assert ap > 0.5

    def test_blobs_average_precision_perfect_masks(self):
        gt = _instance_grid(shape=(12, 32, 32), cell=8)
        # separate the instances so CC reconstructs them exactly
        mask = (find_boundaries(gt, connectivity=2, mode="thick") == 0).astype(np.float32)
        instances = gt * (mask > 0)

        inp = mask[None, None]
        target = np.stack([mask, instances.astype(np.float32)], axis=0)[None]
        metric = BlobsAveragePrecision(thresholds=[0.5], metric="ap")
        ap = metric(inp, target)
        assert ap > 0.9

    def test_generic_ap_min_instance_filter(self):
        gt = np.zeros((8, 16, 16), dtype=np.int64)
        gt[:4, :8, :8] = 1  # large instance (256 voxels)
        gt[0, 15, 15] = 2  # tiny instance (1 voxel)

        class Identity(GenericAveragePrecision):
            def input_to_seg(self, input, target=None):
                return input[None] if input.ndim == 3 else input

        metric = Identity(min_instance_size=10, use_last_target=True, metric="ap")
        inp = gt.astype(np.float32)[None, None]
        target = np.stack([gt.astype(np.float32), gt.astype(np.float32)], axis=0)[None]
        # the tiny instance is filtered from both sides: perfect score
        assert metric(inp, target) == pytest.approx(1.0)
