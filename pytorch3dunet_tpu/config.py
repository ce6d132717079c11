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
        yield from (member.value for member in cls)


# legacy device strings from reference configs are mapped to the auto-detected backend
_LEGACY_DEVICES = ("cuda", "mps")

# prediction-time override flags, same set as the reference CLI (config.py:74-79):
# (dotted config path, element type, nargs)
_CLI_OVERRIDES = (
    ("model_path", str, None),
    ("loaders.output_dir", str, None),
    ("loaders.test.file_paths", str, "+"),
    ("loaders.test.slice_builder.patch_shape", int, "+"),
    ("loaders.test.slice_builder.stride_shape", int, "+"),
)


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
        device = default_device()
        logger.info(f"Config has no 'device' key -- autodetected {device.value}")
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
        supported = ", ".join(Device.values())
        raise ValueError(f"Config key device: {config_device} not understood -- supported values: {supported}") from e


def override_config(args, config):
    """Writes non-None CLI values into the config dict.

    Mirrors reference semantics (unet3d/config.py:46-68): dotted keys descend
    into nested dicts; unknown keys raise; a dotted path that ends on a dict
    node is left untouched (the reference's own quirk).
    """
    overrides = {k: v for k, v in vars(args).items() if k != "config" and v is not None}
    for dotted, value in overrides.items():
        node = config
        for part in dotted.split("."):
            if part not in node:
                raise ValueError(f"Invalid config key: {dotted}")
            if isinstance(node[part], dict):
                node = node[part]
            else:
                node[part] = value


def load_config(argv=None) -> tuple[dict, str]:
    parser = argparse.ArgumentParser(description="UNet3D")
    parser.add_argument("--config", type=str, help="Path to the YAML config file", required=True)
    for dotted, typ, nargs in _CLI_OVERRIDES:
        parser.add_argument(f"--{dotted}", type=typ, nargs=nargs, required=False)

    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    override_config(args, config)

    config["device"] = resolve_device(config.get("device", None))
    if config["device"] == Device.CPU:
        logger.warning("Running on CPU: expect slow training/prediction")

    return config, args.config


def load_config_file(path: str) -> dict:
    """Loads a config YAML programmatically (no CLI): device resolved, no
    overrides. Used by serve3dunet and library embedders."""
    with open(path) as f:
        config = yaml.safe_load(f)
    config["device"] = resolve_device(config.get("device", None))
    return config


def copy_config(config: dict, config_path: str):
    """Copies the config file into the newest run directory under checkpoint_dir/logs."""
    logs_root = os.path.join(config["trainer"].pop("checkpoint_dir"), "logs")
    if not os.path.isdir(logs_root):
        return
    run_dirs = [entry.path for entry in os.scandir(logs_root) if entry.is_dir()]
    if run_dirs:
        dest = os.path.join(max(run_dirs), os.path.basename(config_path))
        shutil.copy2(config_path, dest)
