"""Probe: space-to-depth (phase-layout) level-1 ops vs the current full-res ops.

Compares, on the canonical level-1 shapes (bf16, v5e):
  conv32:   conv3x3 32->32 on (1,80,170,170,32)      [current production path]
  s2dconv:  conv2x2x2 256->256 on (1,40,85,85,256)    [same logical conv in s2d
            layout; 2.37x the MACs but N=256 on the MXU]
  upwide:   conv3x3x3 64->256 on (1,40,85,85,64)      [decoder up-branch: all 8
            output phases in one wide conv, zero-padded taps]
  strided:  conv3x3 16->256 stride 2, all 8 phase offsets in one wide kernel
            (the full-res -> s2d entry conv)
  pool:     reshape-pool vs phase-max over the s2d block axis
Activations are generated ONCE; iterations vary only the (tiny) kernel, so the
scan body is the op itself (the runtime memoizes identical dispatches).
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from pytorch3dunet_tpu.ops.conv import _as2d  # noqa: E402

DT = jnp.bfloat16
STEPS = 30


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(out)
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) * 1e3 / STEPS
    print(f"{name:38s} {dt:8.3f} ms")
    return dt


def scan_kernel(body, kshape, key):
    """body(x, w) -> scalar; x fixed, w re-derived per iteration."""

    def run(x):
        w0 = jax.random.normal(key, kshape, DT)

        def step(c, i):
            w = w0 * (1.0 + i.astype(DT) * 1e-6)
            return c + body(x, w), None

        tot, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(STEPS))
        return tot

    return run


def main():
    key = jax.random.PRNGKey(0)
    meta3 = (3, 3, 3, 1, 1, 1)
    meta2 = (2, 2, 2, 0, 0, 0)

    def fwd(meta):
        return lambda x, w: jnp.sum(_as2d(x, w, meta).astype(jnp.float32))

    def fwdbwd(meta):
        def body(x, w):
            loss = lambda x_, w_: jnp.sum(_as2d(x_, w_, meta).astype(jnp.float32))
            l, (gx, gw) = jax.value_and_grad(loss, (0, 1))(x, w)
            return l + jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

        return body

    def strided_fwd(x, w):
        # full-res (1,80,170,170,16) -> all 8 phases at once: conv stride 2,
        # kernel 4^3 zero-padded from 3^3 so every phase offset is covered
        out = jax.lax.conv_general_dilated(
            x.reshape(80, 170, 170, 16),
            w,
            (2, 2),
            [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(out.astype(jnp.float32))

    def pool_reshape(x, w):
        def loss(x_):
            n, d, h, wd, c = x_.shape
            r = x_.reshape(n, d // 2, 2, h // 2, 2, wd // 2, 2, c)
            return jnp.sum(r.max((2, 4, 6)).astype(jnp.float32)) + jnp.sum(w)

        l, g = jax.value_and_grad(loss)(x)
        return l + jnp.sum(g.astype(jnp.float32))

    def pool_phase(x, w):
        def loss(x_):
            return jnp.sum(x_.max(-2).astype(jnp.float32)) + jnp.sum(w)

        l, g = jax.value_and_grad(loss)(x)
        return l + jnp.sum(g.astype(jnp.float32))

    x32 = jax.random.normal(jax.random.fold_in(key, 1), (1, 80, 170, 170, 32), DT)
    xs2d = jax.random.normal(jax.random.fold_in(key, 2), (1, 41, 86, 86, 256), DT)
    xup = jax.random.normal(jax.random.fold_in(key, 3), (1, 40, 85, 85, 64), DT)
    xph = jax.random.normal(jax.random.fold_in(key, 5), (1, 40, 85, 85, 8, 32), DT)

    print(f"per-instance times, {STEPS} scanned iterations, bf16, data fixed")
    timeit("conv32 fwd (80,170,170,32)", scan_kernel(fwd(meta3), (3, 3, 3, 32, 32), key), x32)
    timeit("conv32 fwd+bwd", scan_kernel(fwdbwd(meta3), (3, 3, 3, 32, 32), key), x32)
    timeit("s2dconv fwd (40,85,85,256) 2^3", scan_kernel(fwd(meta2), (2, 2, 2, 256, 256), key), xs2d)
    timeit("s2dconv fwd+bwd", scan_kernel(fwdbwd(meta2), (2, 2, 2, 256, 256), key), xs2d)
    timeit("upwide fwd (40,85,85,64)->256 3^3", scan_kernel(fwd(meta3), (3, 3, 3, 64, 256), key), xup)
    timeit("upwide fwd+bwd", scan_kernel(fwdbwd(meta3), (3, 3, 3, 64, 256), key), xup)
    x16 = jax.random.normal(jax.random.fold_in(key, 4), (1, 80, 170, 170, 16), DT)
    timeit("strided16->256 fwd (s2d entry)", scan_kernel(strided_fwd, (4, 4, 16, 256), key), x16)
    timeit("pool reshape fwd+bwd", scan_kernel(pool_reshape, (8,), key), x32)
    timeit("pool phase-max fwd+bwd", scan_kernel(pool_phase, (8,), key), xph)


if __name__ == "__main__":
    main()
