"""Evaluation metric registry: Dice, MeanIoU, AdaptedRand, AveragePrecision, PSNR, MSE.

Parity with the reference (pytorch3dunet/unet3d/metrics.py). Metrics run on
the host at validation cadence — exactly as the reference, which leaves the
device at metrics.py:131,299 — so they are numpy implementations. The metric
layout contract is channels-first (N, C, D, H, W) numpy arrays (the trainer
converts from the internal channels-last device layout via `to_metric_layout`).
"""

import numpy as np

from pytorch3dunet_tpu.seg_metrics import Accuracy, AveragePrecision
from pytorch3dunet_tpu.utils import get_class, get_logger
from pytorch3dunet_tpu.utils.ndimage import (
    adapted_rand_error,
    label,
    mean_squared_error,
    peak_signal_noise_ratio,
)

logger = get_logger("EvalMetric")


def to_metric_layout(output, target, is3d: bool = True):
    """Converts channels-last device tensors to the reference metric layout.

    output: (N, *spatial, C) -> (N, C, D, H, W); 2D outputs get a singleton
    depth axis (mirroring the trainer's unsqueeze at trainer.py:357-359).
    target: channels-last targets are transposed alongside; integer class-map
    targets (one dim less than output) are passed through as (N, D, H, W).
    """
    out = np.moveaxis(np.asarray(output), -1, 1)
    tar = np.asarray(target)
    if tar.ndim == out.ndim:
        tar = np.moveaxis(tar, -1, 1)
    if not is3d:
        out = np.expand_dims(out, axis=-3)
        tar = np.expand_dims(tar, axis=-3)
    return out, tar


def _per_channel_dice_np(input, target, epsilon=1e-6):
    assert input.shape == target.shape
    C = input.shape[1]
    inp = np.moveaxis(input, 1, 0).reshape(C, -1).astype(np.float64)
    tar = np.moveaxis(target, 1, 0).reshape(C, -1).astype(np.float64)
    intersect = (inp * tar).sum(-1)
    denominator = (inp * inp).sum(-1) + (tar * tar).sum(-1)
    return 2 * (intersect / np.clip(denominator, epsilon, None))


class DiceCoefficient:
    """Mean per-channel Dice on probabilities (metrics.py:15-27)."""

    def __init__(self, epsilon=1e-6, **kwargs):
        self.epsilon = epsilon

    def __call__(self, input, target):
        return float(np.mean(_per_channel_dice_np(np.asarray(input), np.asarray(target), epsilon=self.epsilon)))


class MeanIoU:
    """Per-class IoU averaged over classes and the batch (metrics.py:30-98).

    4D integer targets: input argmax over channels, background optionally
    skipped. 5D targets: per-channel IoU at a 0.5 threshold, background kept.
    """

    def __init__(self, skip_background=True, **kwargs):
        self.skip_background = skip_background

    def __call__(self, input, target):
        input = np.asarray(input)
        target = np.asarray(target)
        assert input.ndim == 5

        n_classes = input.shape[1]
        channelwise = target.ndim == 5
        if not channelwise:
            input = input.argmax(axis=1)

        assert input.shape == target.shape

        per_batch_iou = []
        for _input, _target in zip(input, target):
            per_channel_iou = []
            start_idx = 1 if (self.skip_background and not channelwise) else 0
            for c in range(start_idx, n_classes):
                if channelwise:
                    iou = self._jaccard_index(_input[c] > 0.5, _target[c].astype(bool))
                else:
                    iou = self._jaccard_index(_input == c, _target == c)
                per_channel_iou.append(iou)
            assert per_channel_iou, "All channels were ignored from the computation"
            per_batch_iou.append(np.mean(per_channel_iou))
        return float(np.mean(per_batch_iou))

    @staticmethod
    def _jaccard_index(prediction, target):
        epsilon = 1e-8
        intersection = np.logical_and(target, prediction).sum()
        union = np.logical_or(target, prediction).sum()
        return (intersection + epsilon) / (union + epsilon)


class AdaptedRandError:
    """Adapted Rand error between a predicted segmentation and ground truth
    (metrics.py:101-179). Subclasses define input_to_segm()."""

    def __init__(self, use_last_target=False, ignore_index=None, **kwargs):
        self.use_last_target = use_last_target
        self.ignore_index = ignore_index

    def __call__(self, input, target):
        input = np.asarray(input)
        target = np.asarray(target)
        if self.use_last_target:
            target = target[:, -1, ...]
        else:
            target = target[:, 0, ...]
        target = target.astype(np.int32)

        if self.ignore_index is not None:
            target = target.copy()
            target[target == self.ignore_index] = 0

        per_batch_arand = []
        for _input, _target in zip(input, target):
            if np.all(_target == _target.flat[0]):
                # single-label ground truth would cause a zero division
                logger.info("Skipping ARandError computation: only 1 label present in the ground truth")
                per_batch_arand.append(0.0)
                continue

            segm = self.input_to_segm(_input)
            assert segm.ndim == 4

            per_channel_arand = [adapted_rand_error(_target, channel_segm)[0] for channel_segm in segm]
            per_batch_arand.append(np.min(per_channel_arand))

        mean_arand = float(np.mean(per_batch_arand))
        logger.info(f"ARand: {mean_arand}")
        return mean_arand

    def input_to_segm(self, input):
        # by default the input is assumed to already be a segmentation volume
        return input


class BoundaryAdaptedRandError(AdaptedRandError):
    """ARand from a boundary probability map: threshold, invert, connected
    components (metrics.py:182-234)."""

    def __init__(self, thresholds=None, use_last_target=True, ignore_index=None, input_channel=None,
                 invert_pmaps=True, **kwargs):
        super().__init__(use_last_target=use_last_target, ignore_index=ignore_index, **kwargs)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel
        self.invert_pmaps = invert_pmaps

    def input_to_segm(self, input):
        if self.input_channel is not None:
            input = np.expand_dims(input[self.input_channel], axis=0)

        segs = []
        for predictions in input:
            for th in self.thresholds:
                predictions_th = predictions > th
                if self.invert_pmaps:
                    # treat boundary signal as background for the CC analysis
                    predictions_th = np.logical_not(predictions_th)
                seg = label(predictions_th.astype(np.uint8), background=0, connectivity=1)
                segs.append(seg)
        return np.stack(segs)


class GenericAdaptedRandError(AdaptedRandError):
    """ARand over selected (optionally inverted) input channels (metrics.py:237-271)."""

    def __init__(self, input_channels, thresholds=None, use_last_target=True, ignore_index=None,
                 invert_channels=None, **kwargs):
        super().__init__(use_last_target=use_last_target, ignore_index=ignore_index, **kwargs)
        assert isinstance(input_channels, (list, tuple))
        self.input_channels = input_channels
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.invert_channels = invert_channels or []

    def input_to_segm(self, input):
        results = []
        for i in self.input_channels:
            c = input[i]
            if i in self.invert_channels:
                c = 1 - c
            results.append(c)
        input = np.stack(results)

        segs = []
        for predictions in input:
            for th in self.thresholds:
                seg = label((predictions > th).astype(np.uint8), background=0, connectivity=1)
                segs.append(seg)
        return np.stack(segs)


class GenericAveragePrecision:
    """Average precision of an instance segmentation derived from the network
    output (metrics.py:274-348)."""

    def __init__(self, min_instance_size=None, use_last_target=False, metric="ap", **kwargs):
        self.min_instance_size = min_instance_size
        self.use_last_target = use_last_target
        assert metric in ["ap", "acc"]
        if metric == "ap":
            self.metric = AveragePrecision()
        else:
            self.metric = Accuracy(iou_threshold=0.5)

    def __call__(self, input, target):
        target = np.asarray(target)
        if target.ndim == 5:
            if self.use_last_target:
                target = target[:, -1, ...]
            else:
                target = target[:, 0, ...]

        input1 = input2 = np.asarray(input) if not isinstance(input, tuple) else None
        multi_head = isinstance(input, tuple)
        if multi_head:
            input1, input2 = (np.asarray(i) for i in input)

        batch_aps = []
        for i_batch, (inp1, inp2, tar) in enumerate(zip(input1, input2, target)):
            inp = (inp1, inp2) if multi_head else inp1

            segs = self.input_to_seg(inp, tar)
            assert segs.ndim == 4
            tar = self.target_to_seg(tar)
            tar = self._filter_instances(tar)

            segs_aps = [self.metric(self._filter_instances(seg), tar) for seg in segs]
            logger.info(f"Batch: {i_batch}. Max Average Precision for channel: {np.argmax(segs_aps)}")
            batch_aps.append(np.max(segs_aps))

        return float(np.mean(batch_aps))

    def _filter_instances(self, input):
        """Overrides instances smaller than min_instance_size with label 0."""
        if self.min_instance_size is not None:
            input = input.copy()
            labels, counts = np.unique(input, return_counts=True)
            for lbl, count in zip(labels, counts):
                if count < self.min_instance_size:
                    input[input == lbl] = 0
        return input

    def input_to_seg(self, input, target=None):
        raise NotImplementedError

    def target_to_seg(self, target):
        return target


class BlobsAveragePrecision(GenericAveragePrecision):
    """AP from a foreground probability map (metrics.py:351-377)."""

    def __init__(self, thresholds=None, metric="ap", min_instance_size=None, input_channel=0, **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True, metric=metric)
        if thresholds is None:
            thresholds = [0.4, 0.5, 0.6, 0.7, 0.8]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel

    def input_to_seg(self, input, target=None):
        input = input[self.input_channel]
        segs = []
        for th in self.thresholds:
            mask = (input > th).astype(np.uint8)
            segs.append(label(mask, background=0, connectivity=1))
        return np.stack(segs)


class BlobsBoundaryAveragePrecision(GenericAveragePrecision):
    """AP from (P_mask - P_boundary) > threshold (metrics.py:380-407)."""

    def __init__(self, thresholds=None, metric="ap", min_instance_size=None, **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True, metric=metric)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6, 0.7]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds

    def input_to_seg(self, input, target=None):
        input = input[0] - input[1]
        segs = []
        for th in self.thresholds:
            mask = (input > th).astype(np.uint8)
            segs.append(label(mask, background=0, connectivity=1))
        return np.stack(segs)


class BoundaryAveragePrecision(GenericAveragePrecision):
    """AP from an inverted boundary probability map (metrics.py:410-433)."""

    def __init__(self, thresholds=None, min_instance_size=None, input_channel=0, **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel

    def input_to_seg(self, input, target=None):
        input = input[self.input_channel]
        segs = []
        for th in self.thresholds:
            segs.append(label(np.logical_not(input > th).astype(np.uint8), background=0, connectivity=1))
        return np.stack(segs)


class PSNR:
    """Peak signal-to-noise ratio, e.g. for denoising eval (metrics.py:436-447)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, input, target):
        return float(peak_signal_noise_ratio(np.asarray(target), np.asarray(input)))


class MSE:
    """Mean squared error (metrics.py:450-458)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, input, target):
        return float(mean_squared_error(np.asarray(input), np.asarray(target)))


def device_metric_fn(criterion):
    """Jittable channels-last device twin of `criterion`, or None.

    The reduction-only metrics (DiceCoefficient, MeanIoU, MSE, PSNR) can run
    on device so a validation batch ships ONE scalar to the host instead of
    the full probability volume — decisive on a high-latency host<->device
    link. Metrics needing host algorithms (connected components, adapted
    rand, average precision) return None and use the numpy path.

    The returned fn consumes the trainer's channels-last (N, *spatial, C)
    probabilities and targets (class-map targets have no channel axis); the
    math matches the numpy implementations above to fp32 rounding.
    """
    import jax
    import jax.numpy as jnp

    if type(criterion) is DiceCoefficient:
        epsilon = criterion.epsilon

        def dice(probs, target):
            non_channel = tuple(range(probs.ndim - 1))
            p = probs.astype(jnp.float32)
            t = target.astype(jnp.float32)
            intersect = jnp.sum(p * t, axis=non_channel)
            denominator = jnp.sum(p * p, axis=non_channel) + jnp.sum(t * t, axis=non_channel)
            return jnp.mean(2.0 * intersect / jnp.clip(denominator, epsilon))

        return jax.jit(dice)

    if type(criterion) is MeanIoU:
        skip_background = criterion.skip_background

        def mean_iou_dev(probs, target):
            epsilon = 1e-8
            if target.ndim == probs.ndim:  # channelwise: threshold per channel
                spatial = tuple(range(1, probs.ndim - 1))
                pred = probs > 0.5
                tar = target != 0
                inter = jnp.sum(pred & tar, axis=spatial)
                union = jnp.sum(pred | tar, axis=spatial)
                return jnp.mean((inter + epsilon) / (union + epsilon))
            pred_cls = jnp.argmax(probs, axis=-1)
            spatial = tuple(range(1, pred_cls.ndim))
            ious = []
            for c in range(1 if skip_background else 0, probs.shape[-1]):
                inter = jnp.sum((pred_cls == c) & (target == c), axis=spatial)
                union = jnp.sum((pred_cls == c) | (target == c), axis=spatial)
                ious.append((inter + epsilon) / (union + epsilon))
            return jnp.mean(jnp.stack(ious))

        return jax.jit(mean_iou_dev)

    if type(criterion) is MSE:
        return jax.jit(lambda probs, target: jnp.mean((probs.astype(jnp.float32) - target.astype(jnp.float32)) ** 2))

    if type(criterion) is PSNR:

        def psnr(probs, target):
            t = target.astype(jnp.float32)
            p = probs.astype(jnp.float32)
            data_range = jnp.where(jnp.min(t) >= 0, 1.0, 2.0)
            err = jnp.mean((t - p) ** 2)
            return jnp.where(err == 0, jnp.inf, 10.0 * jnp.log10(data_range**2 / jnp.maximum(err, 1e-38)))

        return jax.jit(psnr)

    return None


def get_evaluation_metric(config):
    """Builds the eval metric from config['eval_metric'] (metrics.py:461-479)."""
    assert "eval_metric" in config, "Could not find evaluation metric configuration"
    metric_config = config["eval_metric"]
    metric_class = get_class(metric_config["name"], modules=["pytorch3dunet_tpu.metrics"])
    return metric_class(**metric_config)
