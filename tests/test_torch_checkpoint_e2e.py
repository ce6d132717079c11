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
