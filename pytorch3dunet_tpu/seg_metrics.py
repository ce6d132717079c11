"""Instance segmentation metrics: detection accuracy / average precision.

Parity with the reference (pytorch3dunet/unet3d/seg_metrics.py): IoU matrix
from a sparse contingency table, detection at an IoU threshold, and Kaggle
DSB2018-style AveragePrecision over IoU 0.50:0.05:0.95. Pure host-side numpy.
"""

import numpy as np

from pytorch3dunet_tpu.utils.ndimage import contingency_table


def precision(tp, fp, fn):
    return tp / (tp + fp) if tp > 0 else 0


def recall(tp, fp, fn):
    return tp / (tp + fn) if tp > 0 else 0


def accuracy(tp, fp, fn):
    return tp / (tp + fp + fn) if tp > 0 else 0


def f1(tp, fp, fn):
    return (2 * tp) / (2 * tp + fp + fn) if tp > 0 else 0


def _relabel(input):
    _, unique_labels = np.unique(input, return_inverse=True)
    return unique_labels.reshape(input.shape)


def _iou_matrix(gt, seg):
    # relabel for a compact contingency table
    gt = _relabel(gt)
    seg = _relabel(seg)

    n_inter = contingency_table(gt, seg).toarray()
    n_gt = n_inter.sum(axis=1, keepdims=True)
    n_seg = n_inter.sum(axis=0, keepdims=True)
    n_union = n_gt + n_seg - n_inter

    iou_matrix = n_inter / n_union
    assert 0 <= np.min(iou_matrix) <= np.max(iou_matrix) <= 1
    return iou_matrix


class SegmentationMetrics:
    """Precision/recall/accuracy/F1 between a ground truth and predicted
    segmentation, from an eagerly computed IoU matrix (seg_metrics.py:89-134)."""

    def __init__(self, gt, seg):
        self.iou_matrix = _iou_matrix(gt, seg)

    def metrics(self, iou_threshold):
        # ignore background (label 0 row/column)
        iou_matrix = self.iou_matrix[1:, 1:]
        detection_matrix = (iou_matrix > iou_threshold).astype(np.uint8)
        n_gt, n_seg = detection_matrix.shape

        trivial = min(n_gt, n_seg) == 0 or np.all(detection_matrix == 0)
        if trivial:
            tp = fp = fn = 0
        else:
            tp = np.count_nonzero(detection_matrix.sum(axis=1))
            fn = n_gt - tp
            fp = n_seg - np.count_nonzero(detection_matrix.sum(axis=0))

        return {
            "precision": precision(tp, fp, fn),
            "recall": recall(tp, fp, fn),
            "accuracy": accuracy(tp, fp, fn),
            "f1": f1(tp, fp, fn),
        }


class Accuracy:
    """Detection accuracy AC = TP / (TP + FP + FN) at a fixed IoU threshold."""

    def __init__(self, iou_threshold):
        self.iou_threshold = iou_threshold

    def __call__(self, input_seg, gt_seg):
        metrics = SegmentationMetrics(gt_seg, input_seg).metrics(self.iou_threshold)
        return metrics["accuracy"]


class AveragePrecision:
    """Mean detection accuracy over IoU thresholds 0.50:0.05:0.95 (DSB2018 metric)."""

    def __init__(self):
        self.iou_range = np.linspace(0.50, 0.95, 10)

    def __call__(self, input_seg, gt_seg):
        sm = SegmentationMetrics(gt_seg, input_seg)
        acc = [sm.metrics(iou)["accuracy"] for iou in self.iou_range]
        return np.mean(acc)
