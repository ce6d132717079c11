"""End-to-end: predict with a reference-format torch checkpoint.

Builds the actual reference torch model (imported from the mounted reference
with scikit-image stubbed), saves its checkpoint with torch, and runs our
predict CLI against it — the published-pretrained-model workflow.
"""

import os
import sys

import h5py
import numpy as np
import pytest
import torch
import yaml

from tests.test_torch_parity import _import_reference


@pytest.mark.skipif(not _import_reference(), reason="reference package not importable")
def test_predict_with_torch_checkpoint(tmpdir, monkeypatch):
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    tmpdir = str(tmpdir)
    model_cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                 "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}

    torch.manual_seed(0)
    tmodel = torch_get_model(dict(model_cfg))
    tmodel.eval()
    ckpt_path = os.path.join(tmpdir, "reference_best_checkpoint.pytorch")
    torch.save({"model_state_dict": tmodel.state_dict()}, ckpt_path)

    volume = np.random.RandomState(3).rand(16, 64, 64).astype(np.float32)
    vol_path = os.path.join(tmpdir, "vol.h5")
    with h5py.File(vol_path, "w") as f:
        f.create_dataset("raw", data=volume)

    config = {
        "device": "cpu",
        "model_path": ckpt_path,
        "model": model_cfg,
        "predictor": {"name": "StandardPredictor"},
        "loaders": {
            "output_dir": tmpdir, "batch_size": 1, "raw_internal_path": "raw", "num_workers": 1,
            "test": {"file_paths": [vol_path],
                     "slice_builder": {"name": "SliceBuilder", "patch_shape": [16, 64, 64],
                                       "stride_shape": [16, 64, 64], "skip_shape_check": True},
                     "transformer": {"raw": [{"name": "ToTensor", "expand_dims": True}]}},
        },
    }
    cfg_path = os.path.join(tmpdir, "test.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from pytorch3dunet_tpu import predict

    monkeypatch.setattr(sys, "argv", ["predict3dunet", "--config", cfg_path])
    predict.main()

    with h5py.File(os.path.join(tmpdir, "vol_predictions.h5"), "r") as f:
        ours = f["predictions"][:]

    # oracle: the torch reference on the same volume
    with torch.no_grad():
        want = tmodel(torch.from_numpy(volume[None, None])).numpy()[0]

    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, atol=5e-4)


@pytest.mark.skipif(not _import_reference(), reason="reference package not importable")
def test_resume_training_from_torch_checkpoint(tmpdir):
    # torch checkpoints carry no optax state: resume must fall back to a
    # fresh optimizer instead of raising (the published fine-tune workflow)
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    from pytorch3dunet_tpu.trainer import create_trainer

    tmpdir = str(tmpdir)
    model_cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                 "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}
    torch.manual_seed(0)
    ckpt_path = os.path.join(tmpdir, "last_checkpoint.pytorch")
    torch.save({"model_state_dict": torch_get_model(dict(model_cfg)).state_dict()}, ckpt_path)

    rs = np.random.RandomState(0)
    for name in ("t.h5", "v.h5"):
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=rs.rand(16, 64, 64))
            f.create_dataset("label", data=rs.randint(0, 2, (16, 64, 64)))

    transformer = {"raw": [{"name": "ToTensor", "expand_dims": True}],
                   "label": [{"name": "ToTensor", "expand_dims": False, "dtype": "int64"}]}
    sb = {"name": "SliceBuilder", "patch_shape": [8, 32, 32], "stride_shape": [8, 32, 32],
          "skip_shape_check": True}
    config = {
        "device": "cpu",
        "model": model_cfg,
        "loss": {"name": "CrossEntropyLoss"},
        "eval_metric": {"name": "MeanIoU"},
        "optimizer": {"learning_rate": 1e-3},
        "lr_scheduler": {"name": "MultiStepLR", "milestones": [100], "gamma": 0.5},
        "trainer": {"checkpoint_dir": tmpdir, "resume": ckpt_path, "validate_after_iters": 100,
                    "log_after_iters": 100, "max_num_epochs": 2, "max_num_iterations": 2,
                    "eval_score_higher_is_better": True},
        "loaders": {
            "dataset": "StandardHDF5Dataset", "batch_size": 1, "num_workers": 1,
            "raw_internal_path": "raw", "label_internal_path": "label",
            "train": {"file_paths": [os.path.join(tmpdir, "t.h5")], "slice_builder": sb,
                      "transformer": transformer},
            "val": {"file_paths": [os.path.join(tmpdir, "v.h5")], "slice_builder": sb,
                    "transformer": transformer},
        },
    }
    trainer = create_trainer(config)
    trainer.fit()
    assert trainer.num_iterations >= 2
