"""Cooperative spatially-sharded inference: every patch's z-axis split across
the mesh (halo-exchanged convs + psum'd GroupNorm) must compute exactly the
unsharded sweep. This is how `patch_mode: slab` keeps a multi-chip mesh busy
when there are fewer slabs than devices (reference has no analog: its
DataParallel inference needs batch > n_gpus, predict.py:63-67)."""

import os

import h5py
import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.parallel.spatial import space_mesh

MODEL_CFG = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
             "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}

# patch (24, 16, 16) + halo (4, 2, 2) -> padded depth 32: divisible by 8
# shards at both pyramid levels (32 -> 16), min_local satisfied
PATCH = (24, 16, 16)
HALO = (4, 2, 2)


def _setup():
    model = get_model(dict(MODEL_CFG))
    variables = model.init(jax.random.PRNGKey(0))
    vol = np.random.RandomState(1).rand(48, 32, 32).astype(np.float32)
    padded = np.pad(vol, [(h, h) for h in HALO], mode="reflect")
    starts = np.asarray([(z, y, x) for z in (0, 24) for y in (0, 16) for x in (0, 16)], np.int32)
    return model, variables, padded, starts


@pytest.mark.parametrize("normalize", [None, "standardize_patch", "normalize"])
def test_spatial_sweep_matches_unsharded(normalize):
    model, variables, padded, starts = _setup()
    plain = DeviceSlidingWindow(model, PATCH, HALO, normalize=normalize)
    coop = DeviceSlidingWindow(model, PATCH, HALO, normalize=normalize,
                               spatial_mesh=space_mesh(8))
    expected = plain(variables, padded, starts)
    got = coop(variables, padded, starts)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_spatial_sweep_gaussian_tta():
    # gaussian blending and y/x-mirror TTA both ride the sharded model
    model, variables, padded, starts = _setup()
    plain = DeviceSlidingWindow(model, PATCH, HALO, blend="gaussian", tta_axes=(1, 2))
    coop = DeviceSlidingWindow(model, PATCH, HALO, blend="gaussian", tta_axes=(1, 2),
                               spatial_mesh=space_mesh(8))
    np.testing.assert_allclose(coop(variables, padded, starts),
                               plain(variables, padded, starts), atol=2e-5)


def test_spatial_sweep_rejects_z_tta_and_bad_depth():
    model, _, _, _ = _setup()
    with pytest.raises(AssertionError, match="z-mirror TTA"):
        DeviceSlidingWindow(model, PATCH, HALO, tta_axes=(0,), spatial_mesh=space_mesh(8))
    with pytest.raises(AssertionError, match="not exactly shardable"):
        # padded depth 30 does not divide across 8 shards
        DeviceSlidingWindow(model, (26, 16, 16), (2, 2, 2), spatial_mesh=space_mesh(8))


def test_predictor_slab_coop_matches_unsharded(tmpdir):
    """patch_mode slab end-to-end: one-ish slab on an 8-device mesh takes the
    cooperative z-sharded path and matches the shard:false run of the SAME
    geometry (max_patch_voxels pinned so both plan depth-72 slabs)."""
    from pytorch3dunet_tpu.datasets.utils import get_test_loaders
    from pytorch3dunet_tpu.predict import get_predictor

    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.RandomState(2).rand(80, 24, 24))
    config = {
        "device": "cpu",
        "model_path": "",
        "model": dict(MODEL_CFG),
        # budget 1600 * 80: slab_z = 80 - 2*4 = 72 for BOTH runs; the
        # cooperative planner then verifies padded depth 80 shards 8 ways
        "predictor": {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab",
                      "blend": "gaussian", "max_patch_voxels": (24 + 16) * (24 + 16) * 80},
        "loaders": {
            "output_dir": str(tmpdir),
            "batch_size": 1,
            "raw_internal_path": "raw",
            "num_workers": 1,
            "test": {
                "file_paths": [path],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 24, 24],
                                  "stride_shape": [8, 24, 24], "halo_shape": [4, 8, 8],
                                  "skip_shape_check": True},
                "transformer": {"raw": [{"name": "Standardize"},
                                        {"name": "ToTensor", "expand_dims": True}]},
            },
        },
    }
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    def run(shard):
        config["predictor"]["shard"] = shard
        predictor = get_predictor(model, variables, config)
        for loader in get_test_loaders(config):
            predictor(loader)
            predictor.finalize()
        out = os.path.join(str(tmpdir), "vol_predictions.h5")
        with h5py.File(out, "r") as f:
            return predictor, f["predictions"][:]

    predictor, coop = run(shard=True)
    assert any(k[-1] == 8 for k in predictor._sweeps), "cooperative path not taken"
    _, single = run(shard=False)
    np.testing.assert_allclose(coop, single, atol=2e-5)
