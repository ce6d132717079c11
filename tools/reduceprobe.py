"""Probe reduction strategies for GroupNorm statistics on TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, C = 2312000, 96
DT = jnp.bfloat16


def timeit(fn, n=30, label=""):
    @jax.jit
    def run(seed):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            x = (jax.random.uniform(k, (1, M, C), dtype=jnp.float32) - 0.5).astype(DT)
            s, ss = fn(x)
            return (acc + jnp.sum(s) + jnp.sum(ss), key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n)
        return acc

    acc = run(jax.random.PRNGKey(0)); _ = float(acc)
    t0 = time.perf_counter()
    acc = run(jax.random.PRNGKey(1)); av = float(acc)
    dt = (time.perf_counter() - t0) / n
    gbps = 2 * M * C * 2 / dt / 1e9
    print(f"{label}: {dt*1000:.2f} ms ({gbps:.0f} GB/s-equiv, {av:.1f})", flush=True)


def plain_sum(x):
    xf = x.astype(jnp.float32)
    return xf.sum(axis=1), (xf * xf).sum(axis=1)


def matmul_sum(x):
    ones = jnp.ones((M,), dtype=DT)
    s = jnp.einsum("m,nmc->nc", ones, x, preferred_element_type=jnp.float32)
    ss = jnp.einsum("nmc,nmc->nc", x, x, preferred_element_type=jnp.float32)
    return s, ss


def folded_sum(x):
    xf = x.astype(jnp.float32).reshape(1, M // 8, 8 * C)
    s8 = xf.sum(axis=1)
    ss8 = (xf * xf).sum(axis=1)
    return s8.reshape(8, C).sum(0)[None], ss8.reshape(8, C).sum(0)[None]


VARIANTS = {"plain": plain_sum, "matmul": matmul_sum, "folded": folded_sum}

if __name__ == "__main__":
    for name in sys.argv[1:] or list(VARIANTS):
        timeit(VARIANTS[name], label=name)
