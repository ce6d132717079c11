"""Loader for the native C++ ops (built lazily with g++, loaded via ctypes).

The native tier holds host-side hot loops that are awkward for numpy — today
the union-find connected-components labeler (native/cc3d.cpp) used by the
evaluation metrics and the DSB predictor. Compilation happens once per source
change (cached .so); every native op has a pure-Python fallback, so the
framework works without a toolchain.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

from pytorch3dunet_tpu.utils.misc import get_logger

logger = get_logger("Native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_lib = None
_load_attempted = False


def _build_and_load():
    source = os.path.join(_NATIVE_DIR, "cc3d.cpp")
    if not os.path.exists(source):
        return None
    with open(source, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    # per-user cache dir (a predictable path in world-writable /tmp could be
    # pre-planted by another local user and CDLL executes constructors);
    # compile to a temp name + atomic rename so concurrent builders never
    # load a half-written ELF
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "p3dunet"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"cc3d_{digest}.so")
    if not os.path.exists(so_path):
        fd, tmp_path = tempfile.mkstemp(suffix=".so", dir=cache_dir)
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp_path, source]
        logger.info(f"Building native ops: {' '.join(cmd)}")
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_path, so_path)
        finally:
            # failed build: drop the mkstemp file instead of littering the cache
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
    lib = ctypes.CDLL(so_path)
    for name, argtypes in [
        ("cc3d_label_i64", [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                            ctypes.c_int, ctypes.c_int64, ctypes.c_void_p]),
        ("cc3d_label_u8", [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int, ctypes.c_uint8, ctypes.c_void_p]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = ctypes.c_int64
    return lib


def get_native_lib():
    global _lib, _load_attempted
    if not _load_attempted:
        _load_attempted = True
        try:
            _lib = _build_and_load()
        except Exception as e:  # toolchain missing / compile error: fall back
            logger.warning(f"Native ops unavailable ({type(e).__name__}: {e}); using scipy fallback")
            _lib = None
    return _lib


def native_label(m: np.ndarray, background: int = 0, connectivity: int | None = None):
    """Connected components via the native labeler; returns (labels, count) or
    None when the native library is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None

    if connectivity is None:
        connectivity = m.ndim
    if m.ndim == 2:
        shape3 = (1,) + m.shape
    elif m.ndim == 3:
        shape3 = m.shape
    else:
        return None

    out = np.empty(shape3, dtype=np.int64)
    if m.dtype == np.uint8:
        src = np.ascontiguousarray(m.reshape(shape3))
        n = lib.cc3d_label_u8(
            src.ctypes.data, *[ctypes.c_int64(s) for s in shape3],
            ctypes.c_int(connectivity), ctypes.c_uint8(background % 256), out.ctypes.data,
        )
    else:
        src = np.ascontiguousarray(m.reshape(shape3), dtype=np.int64)
        n = lib.cc3d_label_i64(
            src.ctypes.data, *[ctypes.c_int64(s) for s in shape3],
            ctypes.c_int(connectivity), ctypes.c_int64(int(background)), out.ctypes.data,
        )
    return out.reshape(m.shape), int(n)
