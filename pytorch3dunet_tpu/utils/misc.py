"""Shared utilities: logging, registries, small helpers.

Parity targets in the reference: pytorch3dunet/unet3d/utils.py:68-112 (logger,
RunningAverage, number_of_features_per_level, get_class).
"""

import importlib
import logging
import os
import sys

import numpy as np

_LOG_FMT = "%(asctime)s [%(threadName)s] %(levelname)s %(name)s - %(message)s"
_loggers: dict[str, logging.Logger] = {}


def _make_stream_handler() -> logging.Handler:
    # stdout matches the reference's CLI behavior; P3DUNET_LOG_STDERR=1 frees
    # stdout for machine-readable output (e.g. bench.py's JSON line)
    target = sys.stderr if os.environ.get("P3DUNET_LOG_STDERR") else sys.stdout
    handler = logging.StreamHandler(target)
    handler.setFormatter(logging.Formatter(fmt=_LOG_FMT))
    return handler


def get_logger(name: str, level=logging.INFO) -> logging.Logger:
    """Cached per-name logger writing timestamped lines to stdout/stderr."""
    if name not in _loggers:
        lg = logging.getLogger(name)
        lg.setLevel(level)
        lg.addHandler(_make_stream_handler())
        _loggers[name] = lg
    return _loggers[name]


class RunningAverage:
    """Streaming mean of scalar updates (reference: unet3d/utils.py:96-107).

    `update(value, n)` folds in `n` observations whose mean is `value`;
    `.avg`, `.sum`, `.count` expose the running statistics.
    """

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n=1):
        self.sum, self.count = self.sum + value * n, self.count + n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0


def setup_compilation_cache():
    """Persist XLA compilations across CLI runs (a first compile over a
    tunneled TPU takes 2-10 minutes). P3DUNET_COMPILE_CACHE overrides the
    per-user default; set it to the empty string to disable."""
    import jax

    path = os.environ.get("P3DUNET_COMPILE_CACHE")
    if path == "":
        return
    if path is None:
        cache_home = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        path = os.path.join(cache_home, "p3dunet", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def number_of_features_per_level(init_channel_number: int, num_levels: int) -> list:
    """Doubling channel schedule per encoder level (unet3d/utils.py:110-112)."""
    schedule, width = [], init_channel_number
    for _ in range(num_levels):
        schedule.append(width)
        width *= 2
    return schedule


def get_number_of_learnable_parameters(params) -> int:
    """Total number of parameters in a JAX pytree of arrays."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def get_class(class_name: str, modules: list[str]) -> type:
    """Resolves a config `name` string to a class, searching `modules` in
    order — the registry-by-importlib pattern the reference uses throughout
    (unet3d/utils.py:331-338), so YAML names resolve identically here."""
    hits = (
        getattr(importlib.import_module(mod), class_name, None) for mod in modules
    )
    found = next((cls for cls in hits if cls is not None), None)
    if found is None:
        raise RuntimeError(f"Unsupported class: {class_name}")
    return found


def convert_to_numpy(*inputs):
    """Host-numpy views of JAX/numpy arrays (reference: unet3d/utils.py:228-243)."""
    return (np.asarray(item) for item in inputs)
