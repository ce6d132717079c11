"""Probe: does XLA:TPU run int8 convs/matmuls faster than bf16 on v5e?

The v5e datasheet lists int8 MXU throughput at 2x the bf16 rate
(394 TOPS vs 197 TFLOP/s). If `lax.conv_general_dilated` /
`lax.dot_general` with int8 operands reach that rate, a quantized
sliding-window predict path is worth building; if XLA upcasts or the
int8 path is slow, record the negative and stop.

Shapes mirror the inference hot loop: the as-2d decomposition of the
UNet3D level-0 conv (Cin=Cout=32, 3x3 planes, z folded into batch) and
a deeper level (C=256) where the MXU is actually fed.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, args, n=30, label="", flops=None):
    @jax.jit
    def run(seed, *a):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            # vary every operand by the key so nothing hoists out of the loop
            bump = jax.random.randint(k, (), 0, 3).astype(a[0].dtype)
            out = fn(*(ai + bump.astype(ai.dtype) for ai in a))
            return (acc + jnp.sum(out, dtype=jnp.float32) * 1e-9, key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n)
        return acc

    acc = run(jax.random.PRNGKey(0), *args)
    _ = float(acc)
    t0 = time.perf_counter()
    acc = run(jax.random.PRNGKey(1), *args)
    av = float(acc)
    dt = (time.perf_counter() - t0) / n
    rate = f" {flops / dt / 1e12:.1f} TF/s" if flops else ""
    print(f"{label}: {dt * 1000:.3f} ms{rate} ({av:.3f})", flush=True)
    return dt


def conv2d(dn_out):
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dn_out,
        )

    return f


def matmul(dn_out):
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dn_out
        )

    return f


def main():
    key = jax.random.PRNGKey(42)

    def mk(shape, dt):
        if dt == jnp.int8:
            return jax.random.randint(key, shape, -4, 4, dtype=jnp.int8)
        return jax.random.uniform(key, shape, dtype=jnp.float32).astype(dt)

    # --- big square matmuls: the clean MXU rate question. 8192^3 is the
    # headline row (int8 1.54x bf16, BENCH_NOTES r4); 4096^3 shows the gap
    # closing as the matmul shrinks toward this workload's sizes ---
    for M, n in ((4096, 30), (8192, 10)):
        mm_flops = 2 * M * M * M
        for dt, out in ((jnp.bfloat16, jnp.bfloat16 if M == 8192 else jnp.float32),
                        (jnp.int8, jnp.int32)):
            a, b = mk((M, M), dt), mk((M, M), dt)
            timeit(matmul(out), (a, b), n=n, label=f"matmul {M}^3 {dt.__name__}",
                   flops=mm_flops)

    # --- level-0 conv, as-2d shape: N=40 planes of 170x170, C=32 ---
    N, H, W, C = 40, 170, 170, 32
    c_flops = 2 * N * H * W * 9 * C * C
    for dt, out in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        x, w = mk((N, H, W, C), dt), mk((3, 3, C, C), dt)
        timeit(conv2d(out), (x, w), label=f"conv2d C=32 {dt.__name__}",
               flops=c_flops)

    # --- level-3 conv: N=40 planes of 22x22, C=256 ---
    N, H, W, C = 40, 22, 22, 256
    c_flops = 2 * N * H * W * 9 * C * C
    for dt, out in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        x, w = mk((N, H, W, C), dt), mk((3, 3, C, C), dt)
        timeit(conv2d(out), (x, w), label=f"conv2d C=256 {dt.__name__}",
               flops=c_flops)

    # --- wide conv at slab-inference shape: planes 320x320, C=64 ---
    N, H, W, C = 16, 320, 320, 64
    c_flops = 2 * N * H * W * 9 * C * C
    for dt, out in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        x, w = mk((N, H, W, C), dt), mk((3, 3, C, C), dt)
        timeit(conv2d(out), (x, w), label=f"conv2d 320x320 C=64 {dt.__name__}",
               flops=c_flops)


if __name__ == "__main__":
    main()
