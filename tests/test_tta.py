"""Mirror-flip test-time augmentation: ensemble correctness on host and device."""

import itertools
import os

import h5py
import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.ops.tta import flip_combos, resolve_tta_axes
from pytorch3dunet_tpu.predict import get_predictor
from pytorch3dunet_tpu.predictor import StandardPredictor


MODEL_3D = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
            "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}
MODEL_2D = {"name": "UNet2D", "in_channels": 1, "out_channels": 1, "layer_order": "gcr",
            "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True}


def test_flip_combos_enumerates_the_powerset():
    combos = flip_combos((1, 2, 3))
    assert len(combos) == 8 and combos[0] == ()
    assert set(combos) == {tuple(c) for r in range(4) for c in itertools.combinations((1, 2, 3), r)}
    assert flip_combos((1, 2)) == [(), (1,), (2,), (1, 2)]


def test_resolve_tta_axes():
    assert resolve_tta_axes(False, None, is_2d=False) == ()
    assert resolve_tta_axes(True, None, is_2d=False) == (0, 1, 2)
    assert resolve_tta_axes(True, None, is_2d=True) == (1, 2)
    assert resolve_tta_axes(True, [0, 2], is_2d=False) == (0, 2)
    # 2D models silently drop the unflippable z axis
    assert resolve_tta_axes(True, [0, 2], is_2d=True) == (2,)
    with pytest.raises(ValueError):
        resolve_tta_axes(True, [3], is_2d=False)
    with pytest.raises(ValueError):
        resolve_tta_axes(True, [0], is_2d=True)


def _manual_tta(base_predictor, batch_ncdhw, patch_axes):
    """Oracle: average the plain forward over every flip combo (numpy side)."""
    acc = None
    for combo in flip_combos(tuple(a + 2 for a in patch_axes)):  # NCDHW: patch k -> k+2
        x = np.flip(batch_ncdhw, combo) if combo else batch_ncdhw
        p = base_predictor._forward(x)
        p = np.flip(p, combo) if combo else p
        acc = p if acc is None else acc + p
    return acc / 2 ** len(patch_axes)


def test_host_forward_tta_matches_manual_3d():
    model = get_model(dict(MODEL_3D))
    variables = model.init(jax.random.PRNGKey(0))
    batch = np.random.RandomState(1).rand(2, 1, 8, 16, 16).astype(np.float32)

    plain = StandardPredictor(model, variables, None, 2)
    tta = StandardPredictor(model, variables, None, 2, tta=True)
    np.testing.assert_allclose(tta._forward(batch), _manual_tta(plain, batch, (0, 1, 2)),
                               atol=1e-5)


def test_host_forward_tta_axes_subset():
    model = get_model(dict(MODEL_3D))
    variables = model.init(jax.random.PRNGKey(0))
    batch = np.random.RandomState(2).rand(1, 1, 8, 16, 16).astype(np.float32)

    plain = StandardPredictor(model, variables, None, 2)
    tta = StandardPredictor(model, variables, None, 2, tta=True, tta_axes=[1, 2])
    np.testing.assert_allclose(tta._forward(batch), _manual_tta(plain, batch, (1, 2)),
                               atol=1e-5)


def test_host_forward_tta_matches_manual_2d():
    model = get_model(dict(MODEL_2D))
    variables = model.init(jax.random.PRNGKey(0))
    batch = np.random.RandomState(3).rand(2, 1, 1, 16, 16).astype(np.float32)

    plain = StandardPredictor(model, variables, None, 1)
    tta = StandardPredictor(model, variables, None, 1, tta=True)
    np.testing.assert_allclose(tta._forward(batch), _manual_tta(plain, batch, (1, 2)),
                               atol=1e-5)


def _make_config(tmpdir, tta=True, shape=(16, 48, 48)):
    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.RandomState(0).rand(*shape))
    return {
        "device": "cpu",
        "model_path": "",
        "model": dict(MODEL_3D),
        "predictor": {"name": "StandardPredictor", "tta": tta},
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


def _predict(config, model, variables):
    from pytorch3dunet_tpu.datasets.utils import get_test_loaders

    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    out = os.path.join(config["loaders"]["output_dir"], "vol_predictions.h5")
    with h5py.File(out, "r") as f:
        return f["predictions"][:]


def test_device_sweep_tta_matches_host(tmpdir):
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    host = _predict(config, model, variables)
    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    device = _predict(config, model, variables)
    np.testing.assert_allclose(device, host, atol=2e-5)

    # and the ensemble actually changes the prediction vs no-TTA
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "tta": False}
    plain = _predict(config, model, variables)
    assert np.abs(device - plain).max() > 1e-6


def test_tta_sharded_matches_unsharded(tmpdir):
    # the mirror ensemble runs inside each shard's patch subset identically
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "tta": True, "shard": False}
    single = _predict(config, model, variables)
    config["predictor"]["shard"] = True
    sharded = _predict(config, model, variables)
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_tta_streamed_matches_unstreamed(tmpdir):
    # TTA flows through _get_sweep into the z-slab streaming path unchanged
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "tta": True, "shard": False}
    full = _predict(config, model, variables)
    config["predictor"]["max_device_voxels"] = 2 * 24 * 64 * 64
    streamed = _predict(config, model, variables)
    np.testing.assert_allclose(streamed, full, atol=2e-5)


def test_device_sweep_2d_tta_matches_host(tmpdir):
    # the 2D sweep forwards z-as-batch slabs; TTA must mirror y/x only
    config = _make_config(tmpdir, shape=(4, 48, 48))
    config["model"] = dict(MODEL_2D, out_channels=2, final_sigmoid=False)
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [1, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [1, 24, 24]
    config["loaders"]["test"]["slice_builder"]["halo_shape"] = [0, 8, 8]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    host = _predict(config, model, variables)
    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    device = _predict(config, model, variables)
    np.testing.assert_allclose(device, host, atol=2e-5)


def test_predictor_config_passthrough(tmpdir):
    config = _make_config(tmpdir)
    config["predictor"] = {"name": "StandardPredictor", "tta": True, "tta_axes": [1, 2]}
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)
    assert predictor.tta is True and predictor._tta_patch_axes() == (1, 2)
