"""Capture a profiler trace of the device-side sliding-window sweep.

Usage: python tools/infertrace.py [outdir]   (analyze with tools/traceview.py)
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow  # noqa: E402
from pytorch3dunet_tpu.models import get_model  # noqa: E402

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_infer"

model = get_model({
    "name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
    "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
    "dtype": "bfloat16",
})
variables = model.init(jax.random.PRNGKey(0), patch_shape=(32, 64, 64))

vol = (128, 320, 320)
patch = (64, 160, 160)
halo = (8, 16, 16)
rs = np.random.RandomState(0)
padded = np.pad(rs.rand(*vol).astype(np.float32), tuple((h, h) for h in halo), mode="reflect")
starts = np.asarray([(z, y, x) for z in (0, 64) for y in (0, 160) for x in (0, 160)], np.int32)

sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo, normalize="standardize_patch")
import jax.numpy as jnp  # noqa: E402

padded_dev = jax.device_put(jnp.asarray(padded)[..., None])
starts_dev = jnp.asarray(starts)
stats = sweep._stats_pytree()
t0 = time.perf_counter()
out, _ = sweep._sweep(variables, padded_dev, starts_dev, stats)
_ = float(out[0, 0, 0, 0])
print("warm", time.perf_counter() - t0, flush=True)

jax.profiler.start_trace(outdir)
t0 = time.perf_counter()
out, _ = sweep._sweep(variables, padded_dev + 1e-6, starts_dev, stats)
_ = float(out[0, 0, 0, 0])
print("traced", time.perf_counter() - t0, flush=True)
jax.profiler.stop_trace()
