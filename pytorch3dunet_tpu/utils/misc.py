"""Shared utilities: logging, registries, small helpers.

Parity targets in the reference: pytorch3dunet/unet3d/utils.py:68-112 (logger,
RunningAverage, number_of_features_per_level, get_class).
"""

import importlib
import logging
import os
import sys

import numpy as np

_loggers: dict[str, logging.Logger] = {}


def get_logger(name: str, level=logging.INFO) -> logging.Logger:
    """Initializes and returns a cached logger with the given name.

    Logs go to stdout (reference behavior); set P3DUNET_LOG_STDERR=1 to route
    them to stderr (e.g. when stdout must carry machine-readable output).
    """
    if name in _loggers:
        return _loggers[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    stream = sys.stderr if os.environ.get("P3DUNET_LOG_STDERR") else sys.stdout
    stream_handler = logging.StreamHandler(stream)
    formatter = logging.Formatter("%(asctime)s [%(threadName)s] %(levelname)s %(name)s - %(message)s")
    stream_handler.setFormatter(formatter)
    logger.addHandler(stream_handler)
    _loggers[name] = logger
    return logger


class RunningAverage:
    """Computes and stores a running average (reference: unet3d/utils.py:96-107)."""

    def __init__(self):
        self.count = 0
        self.sum = 0
        self.avg = 0

    def update(self, value, n=1):
        self.count += n
        self.sum += value * n
        self.avg = self.sum / self.count


def setup_compilation_cache():
    """Persist XLA compilations across CLI runs (a first compile over a
    tunneled TPU takes 2-10 minutes). P3DUNET_COMPILE_CACHE overrides the
    per-user default; set it to the empty string to disable."""
    import jax

    path = os.environ.get("P3DUNET_COMPILE_CACHE")
    if path == "":
        return
    if path is None:
        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "p3dunet", "jax"
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def number_of_features_per_level(init_channel_number: int, num_levels: int) -> list:
    """Geometric channel schedule [f * 2**k] (reference: unet3d/utils.py:110-112)."""
    return [init_channel_number * 2**k for k in range(num_levels)]


def get_number_of_learnable_parameters(params) -> int:
    """Total number of parameters in a JAX pytree of arrays."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def get_class(class_name: str, modules: list[str]) -> type:
    """Finds a class by name in the given list of modules.

    Mirrors the registry-by-importlib pattern used throughout the reference
    (unet3d/utils.py:331-338) so that config `name` strings resolve identically.
    """
    for module in modules:
        m = importlib.import_module(module)
        clazz = getattr(m, class_name, None)
        if clazz is not None:
            return clazz
    raise RuntimeError(f"Unsupported class: {class_name}")


def convert_to_numpy(*inputs):
    """Converts JAX/numpy arrays to host numpy ndarrays (reference: unet3d/utils.py:228-243)."""

    def _to_numpy(i):
        return np.asarray(i)

    return (_to_numpy(i) for i in inputs)
