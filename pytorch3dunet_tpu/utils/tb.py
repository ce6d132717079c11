"""TensorBoard image formatting for train/val batches.

Behavior parity with the reference TensorboardFormatter
(pytorch3dunet/unet3d/utils.py:115-225): extracts the middle z-slice of each
batch sample and emits per-channel grayscale images, or an argmax->RGB label
image for multi-channel predictions/targets. Batches arrive channels-first
(N, C, D, H, W) / (N, D, H, W) — the trainer converts from the internal
channels-last layout before logging, so the emitted tags and images match the
reference exactly.

Structure: the batch is first reduced to per-sample mid-z slices, then a
role-specific emitter (predictions/targets vs. raw inputs) turns each slice
into one or more ``(tag, CHW image)`` pairs.
"""

import numpy as np

from pytorch3dunet_tpu.utils.ndimage import label2rgb


def _rescale_unit(img: np.ndarray) -> np.ndarray:
    """Min-max rescale to [0, 1]; constant images become zeros (not NaN)."""
    return np.nan_to_num((img - np.min(img)) / np.ptp(img))


def _as_chw(tag: str, img: np.ndarray) -> tuple:
    """Validate and lift a slice to CHW for the SummaryWriter."""
    assert img.ndim == 2 or img.ndim == 3, "Only 2D (HW) and 3D (CHW) images are accepted for display"
    if img.ndim == 2:
        return tag, img[None]
    assert img.shape[0] in (1, 3), "Only (1, H, W) or (3, H, W) images are supported"
    return tag, img


def _label_rgb_chw(label_img: np.ndarray) -> np.ndarray:
    """Integer label plane -> (3, H, W) random-color RGB."""
    return np.moveaxis(label2rgb(label_img), -1, 0)


class TensorboardFormatter:
    """Converts a batch of images to (tag, image) pairs for TensorBoard.

    Args:
        skip_last_target: if True, the last channel of the target image is skipped.
        log_channelwise: if True, logs each channel of a multi-channel
            prediction; otherwise takes the argmax over channels and logs a
            single label image.
    """

    def __init__(self, skip_last_target=False, log_channelwise=False, **kwargs):
        self.skip_last_target = skip_last_target
        self.log_channelwise = log_channelwise

    def __call__(self, name: str, batch: np.ndarray) -> list:
        if name == "targets" and self.skip_last_target:
            batch = batch[:, :-1]
        return [_as_chw(tag, img) for tag, img in self._tagged_slices(name, batch)]

    # -- slice extraction ---------------------------------------------------

    def _tagged_slices(self, name, batch):
        """Yield (tag, image) pairs for every sample's middle z-plane."""
        if batch.ndim == 5:  # (N, C, D, H, W)
            z = batch.shape[2] // 2
            for b, sample in enumerate(batch):
                yield from self._emit_sample(name, b, z, sample[:, z])
        else:  # (N, D, H, W): a label volume without a channel axis
            z = batch.shape[1] // 2
            for b, sample in enumerate(batch):
                yield f"{name}/batch_{b}/slice_{z}", _label_rgb_chw(sample[z])

    def _emit_sample(self, name, b, z, chw):
        """Emit images for one sample's (C, H, W) mid-slice."""
        tag = f"{name}/batch_{b}/slice_{z}"
        n_ch = chw.shape[0]
        if name in ("predictions", "targets"):
            if self.log_channelwise and name == "predictions":
                yield from self._per_channel(name, b, z, chw)
            elif n_ch == 1:
                yield tag, _rescale_unit(chw)
            else:
                # class probabilities: collapse to a label image
                yield tag, _label_rgb_chw(chw.argmax(axis=0))
        elif n_ch in (1, 3):
            yield tag, _rescale_unit(chw)
        else:
            yield from self._per_channel(name, b, z, chw)

    @staticmethod
    def _per_channel(name, b, z, chw):
        for c, plane in enumerate(chw):
            yield f"{name}/batch_{b}/channel_{c}/slice_{z}", _rescale_unit(plane)
