"""Schema compatibility: every workload config must build its components.

Covers our resources/ recipes AND (when mounted) the reference's own
resources/ configs — the YAML schema must accept both unchanged.
"""

import glob
import os

import pytest
import yaml

from pytorch3dunet_tpu.losses import get_loss_criterion
from pytorch3dunet_tpu.metrics import get_evaluation_metric
from pytorch3dunet_tpu.models import get_model

OUR_CONFIGS = sorted(glob.glob("/root/repo/resources/*/*.y*ml"))
REFERENCE_CONFIGS = sorted(glob.glob("/root/reference/resources/*/*.y*ml"))


def _check_config(path):
    config = yaml.safe_load(open(path))
    config["device"] = "cpu"

    model = get_model(config["model"])
    assert model.out_channels == config["model"]["out_channels"]

    if "loss" in config:
        assert get_loss_criterion(config) is not None
    if "eval_metric" in config:
        assert get_evaluation_metric(config) is not None

    if "trainer" in config:
        assert "checkpoint_dir" in config["trainer"]
        phases = ["train", "val"]
    else:
        assert "model_path" in config
        phases = ["test"]

    for phase in phases:
        phase_cfg = config["loaders"][phase]
        assert "transformer" in phase_cfg
        assert "file_paths" in phase_cfg


@pytest.mark.parametrize("path", OUR_CONFIGS, ids=[os.path.relpath(p, "/root/repo/resources") for p in OUR_CONFIGS])
def test_our_config(path):
    _check_config(path)


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference resources not mounted")
@pytest.mark.parametrize(
    "path", REFERENCE_CONFIGS, ids=[os.path.relpath(p, "/root/reference/resources") for p in REFERENCE_CONFIGS]
)
def test_reference_config_runs_unchanged(path):
    _check_config(path)


# Which on-device normalization the sweep must resolve for every shipped
# test recipe. A transformer edit that silently drops a recipe to the host
# loop loses the ~2.7x device-sweep win — this test makes that loud.
# (2DUnet_dsb2018 predicts per-image via DSB2018Predictor, not the sweep.)
EXPECTED_DEVICE_PATH = {
    "2DUnet_confocal_boundary": "standardize",
    "3DUnet_confocal_boundary": "standardize",
    "3DUnet_confocal_boundary_tpu": "standardize",
    "3DUnet_lightsheet_boundary": "standardize",
    "3DUnet_lightsheet_boundary_tpu": "standardize",
    "3DUnet_lightsheet_nuclei": "standardize",
    "3DUnet_lightsheet_nuclei_tpu": "standardize",
    "3DUnet_multiclass": "standardize_patch",  # no global_normalization
    "3DUnet_multiclass_tpu": "standardize_patch",
    "3DUnet_denoising": "normalize",
    "3DUnet_denoising_tpu": "normalize",
}

TEST_CONFIGS = sorted(glob.glob("/root/repo/resources/*/test_config*.y*ml"))


@pytest.mark.parametrize(
    "path", TEST_CONFIGS, ids=[p.split("/")[-2] for p in TEST_CONFIGS]
)
def test_recipe_takes_device_sweep_path(path):
    from pytorch3dunet_tpu.inference_device import detect_device_path

    recipe = path.split("/")[-2]
    if recipe not in EXPECTED_DEVICE_PATH:
        pytest.skip(f"{recipe} does not use the sliding-window sweep")

    config = yaml.safe_load(open(path))
    loaders = config["loaders"]
    raw_tf = loaders["test"]["transformer"]["raw"]
    # global_normalization makes the dataset compute volume mean/std and hand
    # them to the Transformer as base stats (hdf5.py); mimic that contract
    stats = {"mean": 0.5, "std": 0.25} if loaders.get("global_normalization") else {}

    resolved = detect_device_path(raw_tf, stats)
    assert resolved is not None, f"{recipe} fell back to the host loop"
    mode, _ = resolved
    assert mode == EXPECTED_DEVICE_PATH[recipe], (recipe, mode)
