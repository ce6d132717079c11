"""Loss and metric numerics tests.

Follows the reference test strategy (tests/test_criterion.py) and additionally
cross-checks loss numerics against torch's library implementations (torch runs
on CPU here purely as a test oracle — the framework itself never imports it).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch3dunet_tpu.losses import (
    BCEDiceLoss,
    BCEWithLogitsLoss,
    CrossEntropyLoss,
    DiceLoss,
    GeneralizedDiceLoss,
    MaskingLossWrapper,
    MSELoss,
    SkipLastTargetChannelWrapper,
    SmoothL1Loss,
    WeightedCrossEntropyLoss,
    WeightedSmoothL1Loss,
    get_loss_criterion,
)
from pytorch3dunet_tpu.metrics import DiceCoefficient, MeanIoU, get_evaluation_metric


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _rand_labels(shape, n, seed=1):
    return np.random.RandomState(seed).randint(0, n, shape)


class TestDiceFamily:
    # channels-last logits/targets: (N, D, H, W, C)
    shape = (2, 4, 8, 8, 3)

    def test_dice_loss_range(self):
        logits = _rand(self.shape) * 4 - 2
        target = (_rand(self.shape, seed=5) > 0.5).astype(np.float32)
        loss = float(DiceLoss()(logits, target))
        assert 0 < loss < 1

    def test_dice_perfect_match(self):
        # huge logits -> probabilities ~ target -> dice ~ 1 -> loss ~ 0
        target = (_rand(self.shape, seed=5) > 0.5).astype(np.float32)
        logits = (target * 2 - 1) * 50.0
        loss = float(DiceLoss()(logits, target))
        assert loss < 1e-3

    def test_generalized_dice_range(self):
        logits = _rand(self.shape) * 4 - 2
        target = (_rand(self.shape, seed=5) > 0.5).astype(np.float32)
        loss = float(GeneralizedDiceLoss()(logits, target))
        assert 0 < loss < 1

    def test_generalized_dice_single_channel(self):
        shape = (2, 4, 8, 8, 1)
        logits = _rand(shape) * 4 - 2
        target = (_rand(shape, seed=5) > 0.5).astype(np.float32)
        loss = float(GeneralizedDiceLoss()(logits, target))
        assert 0 < loss < 1

    def test_bce_dice_loss(self):
        logits = _rand(self.shape) * 4 - 2
        target = (_rand(self.shape, seed=5) > 0.5).astype(np.float32)
        combined = float(BCEDiceLoss(alpha=1.0)(logits, target))
        bce = float(BCEWithLogitsLoss()(logits, target))
        dice = float(DiceLoss()(logits, target))
        np.testing.assert_allclose(combined, bce + dice, rtol=1e-5)


class TestTorchParity:
    """Cross-check elementwise loss numerics against torch implementations."""

    def test_bce_with_logits(self):
        logits = _rand((2, 4, 8, 8, 2)) * 6 - 3
        target = (_rand((2, 4, 8, 8, 2), seed=9) > 0.5).astype(np.float32)
        ours = float(BCEWithLogitsLoss()(logits, target))
        theirs = float(F.binary_cross_entropy_with_logits(torch.from_numpy(logits), torch.from_numpy(target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_bce_with_logits_pos_weight(self):
        logits = _rand((2, 4, 8, 8, 2)) * 6 - 3
        target = (_rand((2, 4, 8, 8, 2), seed=9) > 0.5).astype(np.float32)
        pw = np.array([2.0, 0.5], dtype=np.float32)
        ours = float(BCEWithLogitsLoss(pos_weight=pw)(logits, target))
        # torch layout is channels-first
        lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
        tt = torch.from_numpy(np.moveaxis(target, -1, 1))
        theirs = float(
            F.binary_cross_entropy_with_logits(lt, tt, pos_weight=torch.from_numpy(pw).view(1, 2, 1, 1, 1))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_cross_entropy(self):
        logits = _rand((2, 4, 8, 8, 3)) * 6 - 3
        target = _rand_labels((2, 4, 8, 8), 3)
        ours = float(CrossEntropyLoss()(logits, target))
        lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
        theirs = float(F.cross_entropy(lt, torch.from_numpy(target).long()))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_cross_entropy_weight_and_ignore(self):
        logits = _rand((2, 4, 8, 8, 3)) * 6 - 3
        target = np.random.RandomState(2).randint(-1, 3, (2, 4, 8, 8))
        w = np.array([0.2, 1.0, 2.0], dtype=np.float32)
        ours = float(CrossEntropyLoss(weight=w, ignore_index=-1)(logits, target))
        lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
        theirs = float(
            F.cross_entropy(lt, torch.from_numpy(target).long(), weight=torch.from_numpy(w), ignore_index=-1)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_smooth_l1(self):
        input = _rand((2, 4, 8, 8, 1)) * 4 - 2
        target = _rand((2, 4, 8, 8, 1), seed=3) * 4 - 2
        ours = float(SmoothL1Loss()(input, target))
        theirs = float(F.smooth_l1_loss(torch.from_numpy(input), torch.from_numpy(target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_mse(self):
        input = _rand((2, 4, 8, 8, 1))
        target = _rand((2, 4, 8, 8, 1), seed=3)
        ours = float(MSELoss()(input, target))
        theirs = float(F.mse_loss(torch.from_numpy(input), torch.from_numpy(target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


class TestWrappersAndVariants:
    def test_masking_wrapper(self):
        shape = (2, 4, 8, 8, 1)
        input = _rand(shape) * 2 - 1
        target = _rand_labels(shape, 2).astype(np.float32)
        target[0, 0] = -1
        loss = MaskingLossWrapper(MSELoss(), ignore_index=-1)
        masked = float(loss(input, target))
        # ignored voxels contribute (0 - 0)^2 = 0
        mask = target != -1
        expected = float(np.mean(np.where(mask, (input - target) ** 2, 0.0)))
        np.testing.assert_allclose(masked, expected, rtol=1e-5)

    def test_skip_last_target_channel(self):
        input = _rand((2, 4, 8, 8, 1))
        target = _rand((2, 4, 8, 8, 2), seed=4)
        loss = SkipLastTargetChannelWrapper(MSELoss())
        val = float(loss(input, target))
        expected = float(MSELoss()(input, target[..., :1]))
        np.testing.assert_allclose(val, expected)

    def test_weighted_cross_entropy(self):
        logits = _rand((2, 4, 8, 8, 3)) * 6 - 3
        target = _rand_labels((2, 4, 8, 8), 3)
        val = float(WeightedCrossEntropyLoss()(logits, target))
        assert np.isfinite(val) and val > 0

    def test_weighted_smooth_l1(self):
        input = _rand((2, 4, 8, 8, 1)) * 2
        target = _rand((2, 4, 8, 8, 1), seed=4) * 2
        loss = WeightedSmoothL1Loss(threshold=1.0, initial_weight=0.1, apply_below_threshold=True)
        base = SmoothL1Loss()
        weighted = float(loss(input, target))
        plain = float(base(input, target))
        assert weighted < plain  # down-weighting below threshold reduces loss

    def test_loss_factory(self):
        for name in ["BCEWithLogitsLoss", "BCEDiceLoss", "CrossEntropyLoss", "WeightedCrossEntropyLoss",
                     "GeneralizedDiceLoss", "DiceLoss", "MSELoss", "SmoothL1Loss", "L1Loss"]:
            loss = get_loss_criterion({"loss": {"name": name}, "device": "cpu"})
            assert loss is not None

    def test_loss_factory_wrapping(self):
        loss = get_loss_criterion({"loss": {"name": "DiceLoss", "ignore_index": -1, "skip_last_target": True},
                                   "device": "cpu"})
        assert isinstance(loss, SkipLastTargetChannelWrapper)
        assert isinstance(loss.loss, MaskingLossWrapper)


class TestMetrics:
    def test_dice_coefficient_perfect(self):
        # metric layout is channels-first (N, C, D, H, W)
        target = (_rand((2, 2, 4, 8, 8), seed=5) > 0.5).astype(np.float32)
        assert DiceCoefficient()(target, target) == pytest.approx(1.0)

    def test_mean_iou_multiclass(self):
        probs = _rand((2, 3, 4, 8, 8))
        target = probs.argmax(axis=1)
        assert MeanIoU()(probs, target) == pytest.approx(1.0)

    def test_mean_iou_channelwise(self):
        probs = _rand((2, 3, 4, 8, 8))
        target = (probs > 0.5).astype(np.uint8)
        assert MeanIoU()(probs, target) == pytest.approx(1.0)

    def test_mean_iou_zero_overlap(self):
        probs = np.zeros((1, 2, 4, 8, 8), dtype=np.float32)
        probs[:, 0] = 1.0
        target = np.ones((1, 4, 8, 8), dtype=np.int64)
        assert MeanIoU()(probs, target) == pytest.approx(0.0, abs=1e-6)

    def test_metric_factory(self):
        metric = get_evaluation_metric({"eval_metric": {"name": "MeanIoU", "ignore_index": None}})
        assert isinstance(metric, MeanIoU)
