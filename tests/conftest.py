import os

# force the CPU backend with 8 virtual devices BEFORE jax initializes: tests
# exercise multi-chip sharding on a faked CPU mesh (SURVEY.md §4) and must not
# touch the (slow, tunneled) real TPU.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: 3D conv grads are slow to compile on the CPU
# backend; identical shapes across tests/runs hit the cache
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import h5py
import numpy as np
import pytest
import yaml

TEST_FILES = os.path.join(os.path.dirname(os.path.realpath(__file__)), "resources")


@pytest.fixture
def transformer_config():
    config_path = os.path.join(TEST_FILES, "transformer_config.yml")
    return yaml.safe_load(open(config_path))


@pytest.fixture
def train_config():
    config_path = os.path.join(TEST_FILES, "config_train.yml")
    config = yaml.safe_load(open(config_path))
    config["device"] = "cpu"
    return config


@pytest.fixture
def train_config_2d():
    config_path = os.path.join(TEST_FILES, "config_train_2d.yml")
    config = yaml.safe_load(open(config_path))
    config["device"] = "cpu"
    return config


@pytest.fixture
def test_config():
    config_path = os.path.join(TEST_FILES, "config_test.yml")
    config = yaml.safe_load(open(config_path))
    config["device"] = "cpu"
    return config


@pytest.fixture
def test_config_2d():
    config_path = os.path.join(TEST_FILES, "config_test_2d.yml")
    config = yaml.safe_load(open(config_path))
    config["device"] = "cpu"
    return config


@pytest.fixture
def random_input(tmpdir):
    shape = (32, 128, 128)
    return _create_random_input(tmpdir, shape, min_label=0)


@pytest.fixture
def random_input_with_ignore(tmpdir):
    shape = (32, 128, 128)
    return _create_random_input(tmpdir, shape, min_label=-1)


def _create_random_input(tmpdir, shape, min_label):
    path = os.path.join(tmpdir, "test.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(*shape))
        f.create_dataset("label", data=np.random.randint(min_label, 2, shape))
    return path
