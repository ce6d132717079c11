"""TensorBoard image formatting for train/val batches.

Behavior parity with the reference TensorboardFormatter
(pytorch3dunet/unet3d/utils.py:115-225): extracts the middle z-slice of each
batch sample, logs per-channel images or an argmax->RGB label image for
multi-channel predictions. Batches arrive channels-first (N, C, D, H, W) /
(N, C, H, W) — the trainer converts from the internal channels-last layout
before logging, so the emitted tags/images match the reference exactly.
"""

import numpy as np

from pytorch3dunet_tpu.utils.ndimage import label2rgb


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
        def _check_img(tag_img):
            tag, img = tag_img
            assert img.ndim == 2 or img.ndim == 3, "Only 2D (HW) and 3D (CHW) images are accepted for display"
            if img.ndim == 2:
                img = np.expand_dims(img, axis=0)
            else:
                C = img.shape[0]
                assert C == 1 or C == 3, "Only (1, H, W) or (3, H, W) images are supported"
            return tag, img

        tagged_images = self._process_batch(name, batch)
        return list(map(_check_img, tagged_images))

    def _process_batch(self, name: str, batch: np.ndarray) -> list:
        if name == "targets" and self.skip_last_target:
            batch = batch[:, :-1, ...]

        tag_template = "{}/batch_{}/slice_{}"
        tagged_images = []

        if batch.ndim == 5:
            # NCDHW: log the middle z-slice
            slice_idx = batch.shape[2] // 2
            for batch_idx in range(batch.shape[0]):
                if self.log_channelwise and name == "predictions":
                    tag_template_ch = "{}/batch_{}/channel_{}/slice_{}"
                    for channel_idx in range(batch.shape[1]):
                        tag = tag_template_ch.format(name, batch_idx, channel_idx, slice_idx)
                        img = batch[batch_idx, channel_idx, slice_idx, ...]
                        tagged_images.append((tag, self._normalize_img(img)))
                else:
                    tag = tag_template.format(name, batch_idx, slice_idx)
                    if name in ["predictions", "targets"]:
                        if batch.shape[1] == 1:
                            img = batch[batch_idx, :, slice_idx, ...]
                            tagged_images.append((tag, self._normalize_img(img)))
                        else:
                            # probabilities -> label image
                            img = batch[batch_idx].argmax(axis=0)[slice_idx, ...]
                            img = label2rgb(img).transpose(2, 0, 1)
                            tagged_images.append((tag, img))
                    else:
                        if batch.shape[1] in [1, 3]:
                            img = batch[batch_idx, :, slice_idx, ...]
                            tagged_images.append((tag, self._normalize_img(img)))
                        else:
                            tag_template_ch = "{}/batch_{}/channel_{}/slice_{}"
                            for channel_idx in range(batch.shape[1]):
                                tag = tag_template_ch.format(name, batch_idx, channel_idx, slice_idx)
                                img = batch[batch_idx, channel_idx, slice_idx, ...]
                                tagged_images.append((tag, self._normalize_img(img)))
        else:
            # NDHW (no channel dim): label volume
            slice_idx = batch.shape[1] // 2
            for batch_idx in range(batch.shape[0]):
                tag = tag_template.format(name, batch_idx, slice_idx)
                img = batch[batch_idx, slice_idx, ...]
                lbl = label2rgb(img).transpose(2, 0, 1)
                tagged_images.append((tag, lbl))

        return tagged_images

    @staticmethod
    def _normalize_img(img: np.ndarray) -> np.ndarray:
        return np.nan_to_num((img - np.min(img)) / np.ptp(img))
