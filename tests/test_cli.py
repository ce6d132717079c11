"""End-to-end CLI tests: train3dunet + predict3dunet mains on a tiny workload."""

import os
import sys

import h5py
import numpy as np
import pytest
import yaml


def _write_yaml(path, config):
    with open(path, "w") as f:
        yaml.safe_dump(config, f)
    return path


@pytest.fixture
def tiny_workload(tmpdir):
    tmpdir = str(tmpdir)
    shape = (16, 64, 64)
    rs = np.random.RandomState(0)
    for name in ["train.h5", "val.h5", "test.h5"]:
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=rs.rand(*shape))
            f.create_dataset("label", data=(rs.rand(*shape) > 0.5).astype(np.float32))

    checkpoint_dir = os.path.join(tmpdir, "ckpt")
    os.makedirs(checkpoint_dir)

    model = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "layer_order": "gcr",
             "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True}
    sb = {"name": "SliceBuilder", "patch_shape": [8, 64, 64], "stride_shape": [8, 64, 64]}
    raw_tf = [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}]
    label_tf = [{"name": "ToTensor", "expand_dims": True}]

    train_config = {
        "device": "cpu",
        "model": model,
        "loss": {"name": "BCEDiceLoss"},
        "optimizer": {"learning_rate": 0.001},
        "eval_metric": {"name": "DiceCoefficient"},
        "lr_scheduler": {"name": "ReduceLROnPlateau", "mode": "max", "factor": 0.5, "patience": 5},
        "trainer": {"checkpoint_dir": checkpoint_dir, "resume": None, "validate_after_iters": 2,
                    "log_after_iters": 2, "max_num_epochs": 1, "max_num_iterations": 2,
                    "eval_score_higher_is_better": True},
        "loaders": {
            "dataset": "StandardHDF5Dataset", "batch_size": 1, "num_workers": 1,
            "raw_internal_path": "raw", "label_internal_path": "label",
            "train": {"file_paths": [os.path.join(tmpdir, "train.h5")],
                      "slice_builder": sb, "transformer": {"raw": raw_tf, "label": label_tf}},
            "val": {"file_paths": [os.path.join(tmpdir, "val.h5")],
                    "slice_builder": sb, "transformer": {"raw": raw_tf, "label": label_tf}},
        },
    }
    test_config = {
        "device": "cpu",
        "model_path": os.path.join(checkpoint_dir, "last_checkpoint.pytorch"),
        "model": model,
        "predictor": {"name": "StandardPredictor"},
        "loaders": {
            "output_dir": tmpdir, "batch_size": 1, "raw_internal_path": "raw", "num_workers": 1,
            "test": {"file_paths": [os.path.join(tmpdir, "test.h5")],
                     "slice_builder": {**sb, "halo_shape": [2, 4, 4]},
                     "transformer": {"raw": raw_tf}},
        },
    }
    return {
        "tmpdir": tmpdir,
        "train_yaml": _write_yaml(os.path.join(tmpdir, "train.yml"), train_config),
        "test_yaml": _write_yaml(os.path.join(tmpdir, "test.yml"), test_config),
        "checkpoint_dir": checkpoint_dir,
    }


def test_train_then_predict_cli(tiny_workload, monkeypatch):
    from pytorch3dunet_tpu import predict, train

    monkeypatch.setattr(sys, "argv", ["train3dunet", "--config", tiny_workload["train_yaml"]])
    train.main()
    assert os.path.exists(os.path.join(tiny_workload["checkpoint_dir"], "last_checkpoint.pytorch"))

    monkeypatch.setattr(sys, "argv", ["predict3dunet", "--config", tiny_workload["test_yaml"]])
    predict.main()
    out = os.path.join(tiny_workload["tmpdir"], "test_predictions.h5")
    assert os.path.exists(out)
    with h5py.File(out, "r") as f:
        pred = f["predictions"][:]
    assert pred.shape == (1, 16, 64, 64)
    assert 0 <= pred.min() and pred.max() <= 1
    assert pred.std() > 0
