"""Config system: YAML load + dotted-path CLI overrides + device autodetect.

Schema-compatible with the reference (pytorch3dunet/unet3d/config.py): the same
top-level keys (`manual_seed`, `device`, `model`, `loss`, `optimizer`,
`lr_scheduler`, `eval_metric`, `trainer`, `loaders`, plus `model_path` /
`predictor` for prediction) and the same CLI override flags. Device semantics
are swapped for the TPU build: `tpu` | `cpu` (a `cuda` / `mps` value found in a
legacy config is mapped to the best available backend with a warning so that
all reference `resources/` configs run unchanged).
"""

import argparse
import os
import shutil
from enum import Enum

import yaml

from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("ConfigLoader")


class Device(str, Enum):
    TPU = "tpu"
    CPU = "cpu"

    @classmethod
    def values(cls):
        yield from (c.value for c in cls)


# legacy device strings from reference configs are mapped to the auto-detected backend
_LEGACY_DEVICES = ("cuda", "mps")


def default_device() -> Device:
    """Picks tpu when a TPU backend is available, otherwise cpu."""
    import jax

    try:
        if jax.default_backend() == "tpu" or any(d.platform == "tpu" for d in jax.devices()):
            return Device.TPU
    except RuntimeError:
        pass
    return Device.CPU


def resolve_device(config_device) -> Device:
    if config_device is None:
        logger.info("No device specified in config - determining best device automatically")
        device = default_device()
        logger.info(f"Using device: {device}")
        return device
    if isinstance(config_device, Device):
        return config_device
    if config_device in _LEGACY_DEVICES:
        device = default_device()
        logger.warning(f"Legacy device '{config_device}' in config; using '{device.value}' instead")
        return device
    try:
        return Device(config_device)
    except ValueError as e:
        raise ValueError(
            f"Config key device: {config_device} not understood -- supported values: {', '.join(Device.values())}"
        ) from e


def override_config(args, config):
    """Overrides config params with the ones given on the command line.

    Mirrors reference semantics (unet3d/config.py:46-68): dotted keys descend
    into nested dicts; unknown keys raise.
    """
    args_dict = vars(args)
    args_dict.pop("config")

    for key, value in args_dict.items():
        if value is None:
            continue
        c = config
        for k in key.split("."):
            if k not in c:
                raise ValueError(f"Invalid config key: {key}")
            if isinstance(c[k], dict):
                c = c[k]
            else:
                c[k] = value


def load_config(argv=None) -> tuple[dict, str]:
    parser = argparse.ArgumentParser(description="UNet3D")
    parser.add_argument("--config", type=str, help="Path to the YAML config file", required=True)
    # prediction-time overrides, same set as the reference CLI (config.py:74-79)
    parser.add_argument("--model_path", type=str, required=False)
    parser.add_argument("--loaders.output_dir", type=str, required=False)
    parser.add_argument("--loaders.test.file_paths", type=str, nargs="+", required=False)
    parser.add_argument("--loaders.test.slice_builder.patch_shape", type=int, nargs="+", required=False)
    parser.add_argument("--loaders.test.slice_builder.stride_shape", type=int, nargs="+", required=False)

    args = parser.parse_args(argv)
    config_path = args.config
    config = _load_config_yaml(config_path)
    override_config(args, config)

    config["device"] = resolve_device(config.get("device", None))

    if config["device"] == Device.CPU:
        logger.warning("CPU mode will likely result in slow training/prediction")

    return config, config_path


def copy_config(config: dict, config_path: str):
    """Copies the config file into the newest run directory under checkpoint_dir/logs."""

    def _get_last_subfolder_path(path):
        if not os.path.isdir(path):
            return None
        subfolders = [f.path for f in os.scandir(path) if f.is_dir()]
        return max(subfolders, default=None)

    checkpoint_dir = os.path.join(config["trainer"].pop("checkpoint_dir"), "logs")
    last_run_dir = _get_last_subfolder_path(checkpoint_dir)
    config_file_name = os.path.basename(config_path)

    if last_run_dir:
        shutil.copy2(config_path, os.path.join(last_run_dir, config_file_name))


def _load_config_yaml(config_file):
    with open(config_file) as f:
        return yaml.safe_load(f)
