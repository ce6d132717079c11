"""TensorboardFormatter behavior pins.

Tag layout and image semantics mirror the reference formatter
(pytorch3dunet/unet3d/utils.py:115-225): middle z-slice per sample,
per-channel grayscale for raw inputs with C not in {1, 3}, argmax->RGB for
multi-channel predictions/targets, channelwise option for predictions.
"""

import numpy as np

from pytorch3dunet_tpu.utils.tb import TensorboardFormatter


def test_single_channel_prediction_mid_slice():
    fmt = TensorboardFormatter()
    batch = np.random.rand(2, 1, 8, 6, 5).astype(np.float32)
    out = fmt("predictions", batch)
    assert [tag for tag, _ in out] == [
        "predictions/batch_0/slice_4",
        "predictions/batch_1/slice_4",
    ]
    for i, (_, img) in enumerate(out):
        assert img.shape == (1, 6, 5)
        ref = batch[i, :, 4]
        np.testing.assert_allclose(img, (ref - ref.min()) / np.ptp(ref), rtol=1e-6)


def test_multichannel_prediction_becomes_rgb_label():
    fmt = TensorboardFormatter()
    batch = np.random.rand(1, 4, 6, 5, 5).astype(np.float32)
    out = fmt("predictions", batch)
    assert len(out) == 1
    tag, img = out[0]
    assert tag == "predictions/batch_0/slice_3"
    assert img.shape == (3, 5, 5)  # argmax -> label2rgb


def test_channelwise_predictions():
    fmt = TensorboardFormatter(log_channelwise=True)
    batch = np.random.rand(1, 3, 6, 5, 5).astype(np.float32)
    out = fmt("predictions", batch)
    assert [tag for tag, _ in out] == [
        "predictions/batch_0/channel_0/slice_3",
        "predictions/batch_0/channel_1/slice_3",
        "predictions/batch_0/channel_2/slice_3",
    ]
    assert all(img.shape == (1, 5, 5) for _, img in out)


def test_skip_last_target_channel():
    fmt = TensorboardFormatter(skip_last_target=True)
    batch = np.random.rand(1, 2, 6, 5, 5).astype(np.float32)
    out = fmt("targets", batch)
    # 2 channels -> last skipped -> single channel path
    assert [tag for tag, _ in out] == ["targets/batch_0/slice_3"]
    assert out[0][1].shape == (1, 5, 5)


def test_raw_inputs_channelwise_when_not_displayable():
    fmt = TensorboardFormatter()
    batch = np.random.rand(1, 5, 6, 4, 4).astype(np.float32)
    out = fmt("inputs", batch)
    assert len(out) == 5
    assert out[0][0] == "inputs/batch_0/channel_0/slice_3"
    # RGB-displayable channel counts log jointly
    out3 = fmt("inputs", np.random.rand(1, 3, 6, 4, 4).astype(np.float32))
    assert [tag for tag, _ in out3] == ["inputs/batch_0/slice_3"]
    assert out3[0][1].shape == (3, 4, 4)


def test_label_volume_without_channel_axis():
    fmt = TensorboardFormatter()
    batch = np.random.randint(0, 4, size=(2, 8, 5, 5))
    out = fmt("targets", batch)
    assert [tag for tag, _ in out] == [
        "targets/batch_0/slice_4",
        "targets/batch_1/slice_4",
    ]
    assert all(img.shape == (3, 5, 5) for _, img in out)


def test_constant_image_normalizes_to_zeros():
    fmt = TensorboardFormatter()
    batch = np.full((1, 1, 4, 3, 3), 7.0, dtype=np.float32)
    (_, img), = fmt("predictions", batch)
    np.testing.assert_array_equal(img, np.zeros((1, 3, 3), np.float32))
