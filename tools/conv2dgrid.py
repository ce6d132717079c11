"""Raw 2D conv shape grid on TPU: find which (Cin, Cout) shapes XLA runs fast.

Context: on the UNet3D step, conv2d (Cin=32 -> Cout=96, K=288) measured
106 TF/s while (96 -> 32, K=864) measured 46 and (16 -> 96, K=144) measured 8.
This maps the landscape to drive formulation choices (channel chunking / tap
folding) in ops/conv.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
B, H, W = 80, 170, 170


def timeit(fn, args, n=20, label=""):
    @jax.jit
    def run(seed, *a):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            out = fn(*a, jax.random.uniform(k, (), dtype=jnp.float32))
            return (acc + jnp.sum(out, dtype=jnp.float32) * 1e-6, key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n)
        return acc

    acc = run(jax.random.PRNGKey(0), *args)
    _ = float(acc)
    t0 = time.perf_counter()
    acc = run(jax.random.PRNGKey(1), *args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return dt


def conv(x, w, s):
    return jax.lax.conv_general_dilated(
        x + s.astype(DT), w, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    rs = np.random.RandomState(0)
    cins = [int(c) for c in (sys.argv[1].split(",") if len(sys.argv) > 1 else [16, 32, 64, 96])]
    couts = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else [32, 64, 96, 128])]
    for cin in cins:
        x = jnp.asarray(rs.rand(B, H, W, cin), dtype=DT)
        for cout in couts:
            w = jnp.asarray(rs.rand(3, 3, cin, cout) * 0.01, dtype=DT)
            flops = 2 * 9 * cin * cout * B * H * W
            dt = timeit(conv, (x, w), label=f"conv2d {cin:4d}->{cout:4d} (K={9*cin})")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)


if __name__ == "__main__":
    main()
