"""Device metric twins: must match the host numpy metrics to fp32 rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3dunet_tpu.metrics import (
    MSE,
    PSNR,
    AdaptedRandError,
    DiceCoefficient,
    MeanIoU,
    device_metric_fn,
    to_metric_layout,
)


def _host_value(criterion, probs_cl, target_cl):
    out_np, tar_np = to_metric_layout(probs_cl, target_cl, is3d=True)
    return criterion(out_np, tar_np)


class TestDeviceMetricParity:
    def test_dice(self):
        rs = np.random.RandomState(0)
        probs = rs.rand(2, 8, 10, 10, 3).astype(np.float32)
        target = (rs.rand(2, 8, 10, 10, 3) > 0.5).astype(np.float32)
        crit = DiceCoefficient()
        dev = device_metric_fn(crit)
        assert dev is not None
        assert float(dev(jnp.asarray(probs), jnp.asarray(target))) == pytest.approx(
            _host_value(crit, probs, target), abs=1e-5)

    def test_mean_iou_channelwise(self):
        rs = np.random.RandomState(1)
        probs = rs.rand(2, 6, 8, 8, 2).astype(np.float32)
        target = (rs.rand(2, 6, 8, 8, 2) > 0.5).astype(np.float32)
        crit = MeanIoU()
        dev = device_metric_fn(crit)
        assert float(dev(jnp.asarray(probs), jnp.asarray(target))) == pytest.approx(
            _host_value(crit, probs, target), abs=1e-5)

    @pytest.mark.parametrize("skip_background", [True, False])
    def test_mean_iou_class_map(self, skip_background):
        rs = np.random.RandomState(2)
        probs = rs.rand(2, 6, 8, 8, 4).astype(np.float32)
        target = rs.randint(0, 4, size=(2, 6, 8, 8)).astype(np.int32)
        crit = MeanIoU(skip_background=skip_background)
        dev = device_metric_fn(crit)
        assert float(dev(jnp.asarray(probs), jnp.asarray(target))) == pytest.approx(
            _host_value(crit, probs, target), abs=1e-5)

    def test_mse_and_psnr(self):
        rs = np.random.RandomState(3)
        probs = rs.rand(1, 6, 8, 8, 1).astype(np.float32)
        target = rs.rand(1, 6, 8, 8, 1).astype(np.float32)
        for crit in (MSE(), PSNR()):
            dev = device_metric_fn(crit)
            assert float(dev(jnp.asarray(probs), jnp.asarray(target))) == pytest.approx(
                _host_value(crit, probs, target), rel=1e-5)

    def test_psnr_negative_range_and_exact_match(self):
        rs = np.random.RandomState(4)
        target = (rs.rand(1, 4, 6, 6, 1) * 2 - 1).astype(np.float32)  # [-1, 1]
        probs = target + 0.05 * rs.rand(*target.shape).astype(np.float32)
        crit = PSNR()
        dev = device_metric_fn(crit)
        assert float(dev(jnp.asarray(probs), jnp.asarray(target))) == pytest.approx(
            _host_value(crit, probs, target), rel=1e-5)
        assert float(dev(jnp.asarray(target), jnp.asarray(target))) == np.inf

    def test_host_only_metrics_fall_back(self):
        class Boundary(AdaptedRandError):
            def input_to_segm(self, x):
                return x

        assert device_metric_fn(Boundary()) is None
