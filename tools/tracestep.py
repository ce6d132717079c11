"""Capture a jax.profiler trace of the benchmark train step on the TPU.

Usage: P3DUNET_BENCH_MODEL=<family> python tools/tracestep.py [outdir] [n_steps]
Writes plugins/profile/.../*.trace.json.gz under outdir (default /tmp/jaxtrace_r2).
Families: unet3d (default) / resunet3d / resunetse3d / unet2d (bench.py
FAMILY_PRESETS). Analyze with tools/traceview.py.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_r2"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

import bench  # noqa: E402  (repo-root bench.py)

cfg, patch, batch = bench.FAMILY_PRESETS[bench.BENCH_MODEL]
run_steps, variables, opt_state, _ = bench.build_train_step(cfg, patch, batch)
run = jax.jit(run_steps, static_argnums=(3,))

# warm (compile)
t0 = time.time()
_, _, loss = run(variables, opt_state, jax.random.PRNGKey(7), n_steps)
print("warm", float(loss), time.time() - t0, flush=True)

jax.profiler.start_trace(outdir)
t0 = time.time()
_, _, loss = run(variables, opt_state, jax.random.PRNGKey(42), n_steps)
print("traced", float(loss), time.time() - t0, flush=True)
jax.profiler.stop_trace()
print("done", flush=True)
