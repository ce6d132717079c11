"""Config loading and dotted-path CLI override tests (reference: tests/test_config.py)."""

import os

import yaml

from pytorch3dunet_tpu.config import load_config


def test_override_config(test_config, tmpdir):
    config_path = os.path.join(str(tmpdir), "cfg.yml")
    test_config.pop("device", None)
    with open(config_path, "w") as f:
        yaml.safe_dump(test_config, f)

    argv = [
        "--config", config_path,
        "--model_path", "/tmp/model.ckpt",
        "--loaders.output_dir", "/tmp/out",
        "--loaders.test.file_paths", "/tmp/a.h5", "/tmp/b.h5",
        "--loaders.test.slice_builder.patch_shape", "8", "16", "16",
    ]
    config, path = load_config(argv)
    assert path == config_path
    assert config["model_path"] == "/tmp/model.ckpt"
    assert config["loaders"]["output_dir"] == "/tmp/out"
    assert config["loaders"]["test"]["file_paths"] == ["/tmp/a.h5", "/tmp/b.h5"]
    assert config["loaders"]["test"]["slice_builder"]["patch_shape"] == [8, 16, 16]
    assert str(config["device"].value) in ("cpu", "tpu")


def test_legacy_device_mapped(test_config, tmpdir):
    config_path = os.path.join(str(tmpdir), "cfg.yml")
    test_config["device"] = "cuda"
    with open(config_path, "w") as f:
        yaml.safe_dump(test_config, f)
    config, _ = load_config(["--config", config_path])
    assert str(config["device"].value) in ("cpu", "tpu")
