"""Measure achievable HBM streaming bandwidth for the train step's loop-fusion
shapes on this chip.

The r3 roofline (BENCH_NOTES) floors the 20.8 ms of loop fusions at the
819 GB/s HBM spec. The trace shows them at 430-590 GB/s; this probe measures
what an ISOLATED elementwise pass over the same tensors can actually reach,
so the roofline floor can use a measured denominator instead of the spec.

Each variant scans N iterations carrying the tensor itself (x -> f(x)): the
write cannot be elided (it is the loop carry), the input varies per
iteration (no hoisting), and one scalar read closes the timing. Bandwidth is
reported as (bytes_read + bytes_written) / time.

Variants:
  flat_f32 / flat_bf16    1-D tensor, lane-dense: the layout-free peak
  c32_bf16 / c32_f32      (1,80,170,170,32) channels-last, the step's
                          full-res activation shape (default C-minor layout)
  c32_gnapply             GN-apply-shaped: y = relu((x-m)*r*g+b) with
                          per-channel stats, bf16 in/out
  c32_relubwd             2-read 1-write: dx = where(y>0, g, 0)
  d_minor_bf16            same volume bitcast to (1,32*170,170,80): D-in-
                          lanes-ish dense minor dim (what XLA picks in-step)

Usage: python tools/bwprobe.py [variant ...]   (default: all)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VOX = 80 * 170 * 170  # the canonical full-res patch

# the tunnel adds a fixed ~30 ms dispatch overhead per run (measured: the
# flat_f32 trace shows 0.90 ms/iter on device vs 1.56 ms wall at n=50);
# raise n until the per-iteration wall time converges to the device time
N_ITERS = int(os.environ.get("BWPROBE_N", "400"))


def timeit(make, step, bytes_per_iter, label, n=N_ITERS):
    """make(key) -> carry; step(carry, scalar) -> carry (same shape/dtype)."""

    @jax.jit
    def run(key):
        x0 = make(key)
        ts = jax.random.uniform(key, (n,), dtype=jnp.float32) + 1.0

        def body(x, t):
            return step(x, t), None

        xn, _ = jax.lax.scan(body, x0, ts)
        return jnp.float32(xn.astype(jnp.float32).sum())

    _ = float(run(jax.random.PRNGKey(0)))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / n
    gbps = bytes_per_iter / dt / 1e9
    print(f"{label}: {dt * 1000:.3f} ms/pass, {gbps:.0f} GB/s  (chk {v:.1f})", flush=True)
    return gbps


def flat(dtype):
    nbytes = jnp.dtype(dtype).itemsize
    size = VOX * 32

    def make(key):
        return jax.random.uniform(key, (size,), dtype=jnp.float32).astype(dtype)

    def step(x, t):
        return (x.astype(jnp.float32) * 0.999 + t * 1e-6).astype(dtype)

    return make, step, 2 * size * nbytes


def c32(dtype):
    nbytes = jnp.dtype(dtype).itemsize
    shape = (1, 80, 170, 170, 32)

    def make(key):
        return jax.random.uniform(key, shape, dtype=jnp.float32).astype(dtype)

    def step(x, t):
        return (x.astype(jnp.float32) * 0.999 + t * 1e-6).astype(dtype)

    return make, step, 2 * VOX * 32 * nbytes


def d_minor(dtype):
    nbytes = jnp.dtype(dtype).itemsize
    shape = (1, 32 * 170, 170, 80)

    def make(key):
        return jax.random.uniform(key, shape, dtype=jnp.float32).astype(dtype)

    def step(x, t):
        return (x.astype(jnp.float32) * 0.999 + t * 1e-6).astype(dtype)

    return make, step, 2 * VOX * 32 * nbytes


def gn_apply():
    shape = (1, 80, 170, 170, 32)

    def make(key):
        return jax.random.uniform(key, shape, dtype=jnp.float32).astype(jnp.bfloat16)

    def step(x, t):
        m = jnp.full((32,), 0.5, jnp.float32) * t
        r = jnp.full((32,), 1.0, jnp.float32) / t
        g = jnp.full((32,), 0.999, jnp.float32)
        b = jnp.full((32,), 1e-6, jnp.float32) * t
        y = (x.astype(jnp.float32) - m) * r * g + b
        return jnp.maximum(y, -10.0).astype(jnp.bfloat16)  # keep values alive

    return make, step, 2 * VOX * 32 * 2


def relu_bwd():
    shape = (1, 80, 170, 170, 32)

    def make(key):
        return jax.random.uniform(key, shape, dtype=jnp.float32).astype(jnp.bfloat16)

    def step(x, t):
        # 2 reads (x as both "activation" and "cotangent" via a shifted view
        # computed in-register), 1 write
        g = x * jnp.bfloat16(0.999)
        return jnp.where(x > jnp.bfloat16(0.3), g + jnp.bfloat16(t * 1e-6), x)

    return make, step, 2 * VOX * 32 * 2  # carry read+write; the 2nd "read" is the same buffer


VARIANTS = {
    "flat_f32": lambda: flat(jnp.float32),
    "flat_bf16": lambda: flat(jnp.bfloat16),
    "c32_f32": lambda: c32(jnp.float32),
    "c32_bf16": lambda: c32(jnp.bfloat16),
    "d_minor_bf16": lambda: d_minor(jnp.bfloat16),
    "c32_gnapply": gn_apply,
    "c32_relubwd": relu_bwd,
}



# ---- multi-stream variants (single-stream fusions are latency-bound; the
# step's real fusions read several operands at once) ----


def _multi(shape, dtype, nbuf=4):
    nbytes = jnp.dtype(dtype).itemsize
    size = 1
    for s in shape:
        size *= s

    def make(key):
        ks = jax.random.split(key, nbuf)
        return tuple(
            jax.random.uniform(k, shape, dtype=jnp.float32).astype(dtype) for k in ks
        )

    def step(bufs, t):
        combo = bufs[0].astype(jnp.float32) * 0.9
        for b in bufs[1:]:
            combo = combo + b.astype(jnp.float32) * 0.1
        combo = (combo + t * 1e-6).astype(dtype)
        return bufs[1:] + (combo,)

    # nbuf reads + 1 new write per iteration (rotation reuses buffers)
    return make, step, (nbuf + 1) * size * nbytes


def timeit_multi(make, step, bytes_per_iter, label, n=N_ITERS):
    @jax.jit
    def run(key):
        x0 = make(key)
        ts = jax.random.uniform(key, (n,), dtype=jnp.float32) + 1.0

        def body(c, t):
            return step(c, t), None

        xn, _ = jax.lax.scan(body, x0, ts)
        return jnp.float32(sum(b.astype(jnp.float32).sum() for b in xn))

    _ = float(run(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    v = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / n
    gbps = bytes_per_iter / dt / 1e9
    print(f"{label}: {dt * 1000:.3f} ms/pass, {gbps:.0f} GB/s  (chk {v:.1f})", flush=True)
    return gbps


MULTI_VARIANTS = {
    "m4_flat_f32": ((VOX * 32,), jnp.float32),
    "m4_flat_bf16": ((VOX * 32,), jnp.bfloat16),
    "m4_c32_bf16": ((1, 80, 170, 170, 32), jnp.bfloat16),
    "m4_dminor_bf16": ((1, 32 * 170, 170, 80), jnp.bfloat16),
    "m4_dminor_f32": ((1, 32 * 170, 170, 80), jnp.float32),
}

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name in sys.argv[1:] or (list(VARIANTS) + list(MULTI_VARIANTS)):
        if name in VARIANTS:
            make, step, bpi = VARIANTS[name]()
            timeit(make, step, bpi, name)
        else:
            shape, dt = MULTI_VARIANTS[name]
            make, step, bpi = _multi(shape, dt)
            timeit_multi(make, step, bpi, name)
