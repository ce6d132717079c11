"""Multi-device training through the real UNetTrainer.fit() path.

VERDICT item: the trainer was only ever exercised on a 1-device mesh (batch-1
configs). These tests run the full fit() loop on the 8-device CPU mesh with a
sharded global batch, device augmentation enabled, and a ragged final batch —
and assert step-level numerical equivalence between the 8-device and
single-device meshes (the TPU replacement for reference nn.DataParallel
semantics, pytorch3dunet/unet3d/trainer.py:202-205, datasets/utils.py:399-403).
"""

import os

import h5py
import jax
import numpy as np
import pytest

import pytorch3dunet_tpu.trainer as trainer_mod
from pytorch3dunet_tpu.parallel.mesh import data_mesh
from pytorch3dunet_tpu.trainer import create_trainer


def _make_volume(tmpdir, name, shape=(24, 192, 64)):
    path = os.path.join(str(tmpdir), name)
    rs = np.random.RandomState(len(name))
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=rs.rand(*shape))
        f.create_dataset("label", data=rs.randint(0, 2, shape))
    return path


def _config(tmpdir, batch_size, device_augment=False, max_iters=2):
    return {
        "manual_seed": 7,
        "device": "cpu",
        "model": {
            "name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
            "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False,
            "is_segmentation": True,
        },
        "trainer": {
            "checkpoint_dir": os.path.join(str(tmpdir), "ckpt"),
            "resume": None, "validate_after_iters": 2, "log_after_iters": 2,
            "max_num_epochs": 1, "max_num_iterations": max_iters,
            "eval_score_higher_is_better": True,
        },
        "optimizer": {"name": "Adam", "learning_rate": 2e-4},
        "loss": {"name": "CrossEntropyLoss"},
        "eval_metric": {"name": "MeanIoU"},
        "lr_scheduler": {"name": "ReduceLROnPlateau", "mode": "max", "factor": 0.5, "patience": 9},
        "loaders": {
            "dataset": "StandardHDF5Dataset",
            "batch_size": batch_size,
            "num_workers": 1,
            "device_augment": device_augment,
            "raw_internal_path": "raw",
            "label_internal_path": "label",
            "train": {
                "file_paths": [_make_volume(tmpdir, "train.h5")],
                # 3x3x1 = 9 patches: with batch 8 the final batch is ragged (1)
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 64, 64],
                                  "stride_shape": [8, 64, 64]},
                "transformer": {
                    "raw": ([{"name": "RandomFlip"}] if device_augment else [])
                    + [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": ([{"name": "RandomFlip"}] if device_augment else [])
                    + [{"name": "ToTensor", "expand_dims": False, "dtype": "int64"}],
                },
            },
            "val": {
                "file_paths": [_make_volume(tmpdir, "val.h5", shape=(8, 64, 64))],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 64, 64],
                                  "stride_shape": [8, 64, 64]},
                "transformer": {
                    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "ToTensor", "expand_dims": False, "dtype": "int64"}],
                },
            },
        },
    }


def test_fit_on_8_device_mesh_with_device_augment_and_ragged_batch(tmpdir):
    assert jax.device_count() >= 8, "tests require the 8-device virtual CPU mesh"
    config = _config(tmpdir, batch_size=8, device_augment=True, max_iters=2)
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)

    trainer = create_trainer(config)
    assert trainer.device_augmenter is not None, "device augmentation must be active"
    trainer.fit()

    # the first batch (8 samples) sized the mesh to all 8 devices
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    # both full and ragged batches trained (9 patches / batch 8 -> 2 iterations)
    assert trainer.num_iterations > 2
    assert os.path.exists(os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch"))


def test_sharded_fit_matches_single_device(tmpdir, monkeypatch):
    """One full fit() on an 8-device mesh vs the identical fit() on 1 device:
    final parameters must agree (grad psum == single-device batch mean)."""
    results = {}
    for n_dev in (1, 8):
        workdir = os.path.join(str(tmpdir), f"run{n_dev}")
        os.makedirs(os.path.join(workdir, "ckpt"), exist_ok=True)
        config = _config(workdir, batch_size=8, device_augment=False, max_iters=2)
        config["trainer"]["checkpoint_dir"] = os.path.join(workdir, "ckpt")
        # identical data in both runs
        config["loaders"]["train"]["file_paths"] = [_make_volume(tmpdir, "shared_train.h5")]
        config["loaders"]["val"]["file_paths"] = [_make_volume(tmpdir, "shared_val.h5", shape=(8, 64, 64))]

        mesh = data_mesh(jax.devices()[:n_dev])
        monkeypatch.setattr(trainer_mod, "choose_data_mesh", lambda b, devices=None, _m=mesh: _m)

        np.random.seed(123)  # loader shuffle order derives from the global RNG
        trainer = create_trainer(config)
        trainer.fit()
        assert trainer.mesh.devices.size == n_dev
        results[n_dev] = jax.device_get(trainer.variables["params"])

    leaves1 = jax.tree_util.tree_leaves(results[1])
    leaves8 = jax.tree_util.tree_leaves(results[8])
    assert len(leaves1) == len(leaves8)
    for a, b in zip(leaves1, leaves8):
        # psum reassociates the batch-mean sum, and Adam's per-element
        # normalization amplifies the fp32 epsilon through the two steps:
        # observed worst-case drift in-suite is ~1.4e-5 on O(1e-2) params
        # (grad equality itself is asserted bitwise-tight in the dryrun's DP
        # leg); 1e-4 still catches any real reduction/sharding bug, which
        # shows up as O(param)-scale divergence.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_fit_with_spatial_sharding(tmpdir):
    """trainer.spatial_sharding: the patch's D axis shards across devices
    (halo-exchanged convs); works end-to-end through fit() at batch 1."""
    config = _config(tmpdir, batch_size=1, max_iters=2)
    config["trainer"]["spatial_sharding"] = True
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)

    trainer = create_trainer(config)
    trainer.fit()

    # patch D=8, 2 levels (8 -> 4): largest even shard count is 4
    assert trainer.mesh is not None and trainer.mesh.axis_names == ("space",)
    assert trainer.mesh.devices.size == 4
    assert os.path.exists(os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch"))
