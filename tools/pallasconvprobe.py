"""Measure the Pallas fused conv3d forward vs XLA's as-2d decomposition."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from pytorch3dunet_tpu.ops import conv_pallas  # noqa: E402
from tools.convprobe import DT, conv3d_as_2d, timeit  # noqa: E402


import os
_TH = int(os.environ.get("PROBE_TH", "0"))


_ROLL = os.environ.get("PROBE_ROLL", "0") == "1"


def pallas_fwd(x, w, s):
    if _ROLL:
        xs = x + s.astype(DT)
        impl = conv_pallas._conv3d_fwd_impl_roll
        th = _TH or conv_pallas._choose_th(x.shape[2])
        return impl(xs[0], w.astype(xs.dtype), jnp.zeros((w.shape[-1],), xs.dtype), th)[None]
    if _TH:
        xs = x + s.astype(DT)
        return conv_pallas._conv3d_fwd_impl(
            xs[0], w.astype(xs.dtype), jnp.zeros((w.shape[-1],), xs.dtype), _TH)[None]
    return conv_pallas.conv3d_fwd(x + s.astype(DT), w)


def main():
    shapes = [
        ("full-res 96->32", (1, 80, 170, 170, 96), 32),
        ("full-res 32->32", (1, 80, 170, 170, 32), 32),
        ("full-res 16->32", (1, 80, 170, 170, 16), 32),
        ("L1 192->64", (1, 40, 85, 85, 192), 64),
        ("L1 64->64", (1, 40, 85, 85, 64), 64),
    ]
    if os.environ.get("PROBE_ONE"):
        shapes = shapes[:1]
    rs = np.random.RandomState(0)
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        x = jnp.asarray(rs.rand(*xshape), dtype=DT)
        w = jnp.asarray((rs.rand(3, 3, 3, cin, cout) - 0.5) * 0.05, dtype=DT)
        flops = 2 * 27 * cin * cout * np.prod(xshape[:4])

        # correctness on-device first
        a = np.asarray(conv3d_as_2d(x, w, jnp.float32(0)), dtype=np.float32)
        b_pallas = np.asarray(pallas_fwd(x, w, jnp.float32(0)), dtype=np.float32)
        err = np.abs(a - b_pallas).max()
        print(f"{name}: max|pallas - as2d| = {err:.4e}", flush=True)

        dt = timeit(conv3d_as_2d, (x, w), label=f"{name} as-2d fwd")
        print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        dt = timeit(pallas_fwd, (x, w), label=f"{name} pallas fwd")
        print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)


if __name__ == "__main__":
    main()
