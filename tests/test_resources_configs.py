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
