"""Device-augmentation integration: config splitting + end-to-end training."""

import os

import h5py
import numpy as np

from pytorch3dunet_tpu.ops.augment import DEVICE_MOVABLE, split_device_transforms
from pytorch3dunet_tpu.trainer import create_trainer


def _confocal_style_transformer():
    return {
        "raw": [
            {"name": "Standardize"},
            {"name": "RandomFlip"},
            {"name": "RandomRotate90"},
            {"name": "ElasticDeformation", "spline_order": 3, "execution_probability": 1.0,
             "alpha": 200, "sigma": 10},
            {"name": "AdditiveGaussianNoise", "execution_probability": 1.0},
            {"name": "ToTensor", "expand_dims": True},
        ],
        "label": [
            {"name": "RandomFlip"},
            {"name": "RandomRotate90"},
            {"name": "ElasticDeformation", "spline_order": 0, "execution_probability": 1.0,
             "alpha": 200, "sigma": 10},
            {"name": "ToTensor", "expand_dims": True},
        ],
    }


class TestSplit:
    def test_split_strips_movable(self):
        loaders_config = {
            "device_augment": True,
            "train": {"transformer": _confocal_style_transformer()},
        }
        spec = split_device_transforms(loaders_config)
        assert spec is not None
        assert [e["raw"]["name"] for e in spec["paired"]] == ["RandomFlip", "RandomRotate90",
                                                             "ElasticDeformation"]
        assert [e["name"] for e in spec["raw_only"]] == ["AdditiveGaussianNoise"]
        remaining_raw = [t["name"] for t in loaders_config["train"]["transformer"]["raw"]]
        assert remaining_raw == ["Standardize", "ToTensor"]
        remaining_label = [t["name"] for t in loaders_config["train"]["transformer"]["label"]]
        assert remaining_label == ["ToTensor"]
        assert not DEVICE_MOVABLE.intersection(remaining_raw)

    def test_disabled_returns_none(self):
        loaders_config = {"train": {"transformer": _confocal_style_transformer()}}
        assert split_device_transforms(loaders_config) is None


def test_logged_images_are_post_augmentation(tmpdir):
    """TB images must show the batch the network actually saw: with device
    augmentation the host arrays are pre-augmentation, so the trainer logs
    the augmented device batch instead (trainer.py train())."""
    tmpdir = str(tmpdir)
    shape = (16, 64, 64)
    rs = np.random.RandomState(0)
    for name in ["train.h5", "val.h5"]:
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=rs.rand(*shape))
            f.create_dataset("label", data=(rs.rand(*shape) > 0.5).astype(np.float32))

    sb = {"name": "SliceBuilder", "patch_shape": [8, 32, 32], "stride_shape": [8, 32, 32],
          "skip_shape_check": True}
    config = {
        "device": "cpu",
        "manual_seed": 0,
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
                  "num_groups": 4, "num_levels": 2, "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "optimizer": {"learning_rate": 0.001},
        "eval_metric": {"name": "DiceCoefficient"},
        "trainer": {"checkpoint_dir": os.path.join(tmpdir, "ckpt"), "resume": None,
                    "validate_after_iters": 100, "log_after_iters": 1, "max_num_epochs": 1,
                    "max_num_iterations": 2, "eval_score_higher_is_better": True},
        "loaders": {
            "dataset": "StandardHDF5Dataset", "batch_size": 2, "num_workers": 1,
            "device_augment": True,
            "raw_internal_path": "raw", "label_internal_path": "label",
            "train": {"file_paths": [os.path.join(tmpdir, "train.h5")],
                      "slice_builder": sb, "transformer": _confocal_style_transformer()},
            "val": {"file_paths": [os.path.join(tmpdir, "val.h5")], "slice_builder": sb,
                    "transformer": {
                        "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                        "label": [{"name": "ToTensor", "expand_dims": True}],
                    }},
        },
    }
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)

    trainer = create_trainer(config)
    assert trainer.device_augmenter is not None

    aug_record = {}
    inner = trainer.device_augmenter

    class RecordingAugmenter:
        def __call__(self, key, raw_batch, label_batch):
            out = inner(key, raw_batch, label_batch)
            aug_record["raw"], aug_record["label"] = out
            return out

    trainer.device_augmenter = RecordingAugmenter()

    logged = {}
    orig_log = trainer._log_images
    trainer._log_images = lambda raw, tgt, pred, prefix: logged.update(raw=raw, tgt=tgt) or orig_log(
        raw, tgt, pred, prefix)

    trainer.fit()

    # the logged input is exactly the augmented device batch (reference layout)
    expect_raw = np.moveaxis(np.asarray(aug_record["raw"]), -1, 1)
    expect_tgt = np.moveaxis(np.asarray(aug_record["label"]), -1, 1)
    np.testing.assert_array_equal(logged["raw"], expect_raw)
    np.testing.assert_array_equal(logged["tgt"], expect_tgt)


def test_train_with_device_augment(tmpdir):
    """Full training run with the movable transforms running on device."""
    tmpdir = str(tmpdir)
    shape = (16, 64, 64)
    rs = np.random.RandomState(0)
    for name in ["train.h5", "val.h5"]:
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=rs.rand(*shape))
            f.create_dataset("label", data=(rs.rand(*shape) > 0.5).astype(np.float32))

    sb = {"name": "SliceBuilder", "patch_shape": [8, 32, 32], "stride_shape": [8, 32, 32],
          "skip_shape_check": True}
    config = {
        "device": "cpu",
        "manual_seed": 0,
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
                  "num_groups": 4, "num_levels": 2, "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "optimizer": {"learning_rate": 0.001},
        "eval_metric": {"name": "DiceCoefficient"},
        "trainer": {"checkpoint_dir": os.path.join(tmpdir, "ckpt"), "resume": None,
                    "validate_after_iters": 4, "log_after_iters": 4, "max_num_epochs": 1,
                    "max_num_iterations": 4, "eval_score_higher_is_better": True},
        "loaders": {
            "dataset": "StandardHDF5Dataset", "batch_size": 2, "num_workers": 1,
            "device_augment": True,
            "raw_internal_path": "raw", "label_internal_path": "label",
            "train": {"file_paths": [os.path.join(tmpdir, "train.h5")],
                      "slice_builder": sb, "transformer": _confocal_style_transformer()},
            "val": {"file_paths": [os.path.join(tmpdir, "val.h5")], "slice_builder": sb,
                    "transformer": {
                        "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                        "label": [{"name": "ToTensor", "expand_dims": True}],
                    }},
        },
    }
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)

    trainer = create_trainer(config)
    assert trainer.device_augmenter is not None
    trainer.fit()
    assert trainer.num_iterations >= 4
    assert os.path.exists(os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch"))
