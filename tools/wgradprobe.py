"""Weight-gradient / input-gradient formulation probe for the as-2d conv.

The trace (tools/traceview.py, r2) shows the full-res wgrad convs running at
~30 TF/s and ~207 GB/s: the as-2d decomposition's backward re-reads the
activation volume AND the cotangent once PER DEPTH TAP (3x traffic). A single
fused 3-tap wgrad (the lowering XLA's native conv3d autodiff emits) reads
each operand once. This probe measures, with RANDOM cotangents (constant
cotangents let XLA fold the backward conv — see BENCH_NOTES r2):

  wgrad:  as-2d vjp (production) | native ndhwc vjp | explicit one-call conv
  igrad:  as-2d vjp (production) | native ndhwc vjp | explicit one-call conv

Usage: python tools/wgradprobe.py [wgrad] [igrad] [full]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def timeit(fn, args, n=20, label=""):
    @jax.jit
    def run(seed, *a):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            out = fn(*a, jax.random.uniform(k, (), dtype=jnp.float32))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(o, dtype=jnp.float32) for o in leaves)
            return (acc + s * 1e-6, key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n)
        return acc

    acc = run(jax.random.PRNGKey(0), *args)
    _ = float(acc)
    t0 = time.perf_counter()
    acc = run(jax.random.PRNGKey(1), *args)
    av = float(acc)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.2f} ms ({av:.3f})", flush=True)
    return dt


def conv3d_as_2d(x, w):
    N, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = xp[:, dz : dz + D].reshape(N * D, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs, w[dz], (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = o if out is None else out + o
    return out.reshape(N, D, H, W, -1)


def conv3d_ndhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def wgrad_direct_3d(x, g):
    """All 27 kernel taps in ONE conv: x read once, g read once.

    dw[kd,kh,kw,ci,co] = sum_{n,d,h,w} xpad[n,d+kd,h+kh,w+kw,ci] g[n,d,h,w,co]
    expressed WITHOUT transposes via dimension specs: Ci is the lhs batch, the
    N=1 dim is the contraction feature, g's spatial extent is the window."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, g, (1, 1, 1), "VALID",
        dimension_numbers=("CDHWN", "IDHWO", "DHWNC"),
        preferred_element_type=jnp.float32,
    )  # (3, 3, 3, Ci, Co)


def wgrad_direct_2d_taps(x, g):
    """One transpose-free conv2d wgrad call per depth tap (the shape XLA's own
    conv2d autodiff emits); D folds into the contraction batch."""
    N, D, H, W, C = x.shape
    gs = g.reshape(N * D, H, W, -1)
    outs = []
    xpp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    for dz in range(3):
        lhs = xpp[:, dz : dz + D].reshape(N * D, H + 2, W + 2, C)
        o = jax.lax.conv_general_dilated(
            lhs, gs, (1, 1), "VALID",
            dimension_numbers=("CHWN", "IHWO", "HWNC"),
            preferred_element_type=jnp.float32,
        )  # (3, 3, Ci, Co)
        outs.append(o)
    return jnp.stack(outs, axis=0)


def igrad_direct_3d(g, w):
    """dx in ONE conv: conv3d of the cotangent with the flipped kernel."""
    w_flip = jnp.flip(w, axis=(0, 1, 2))
    w_t = jnp.swapaxes(w_flip, 3, 4)  # (3,3,3,Co,Ci)
    return jax.lax.conv_general_dilated(
        g, w_t, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def igrad_direct_as2d(g, w):
    """dx as 3 conv2ds over the COTANGENT's depth shifts (reads g 3x, like the
    vjp) — control for autodiff overhead."""
    N, D, H, W, Co = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    w_flip = jnp.flip(w, axis=(1, 2))
    out = None
    for dz in range(3):
        gs = gp[:, dz : dz + D].reshape(N * D, H, W, Co)
        o = jax.lax.conv_general_dilated(
            gs, jnp.swapaxes(w_flip[2 - dz], 2, 3), (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = o if out is None else out + o
    return out.reshape(N, D, H, W, -1)


def main(which):
    shapes = [
        ("full-res 32->32", (1, 80, 170, 170, 32), 32),
        ("full-res 16->32", (1, 80, 170, 170, 16), 32),
        ("full-res 96->32", (1, 80, 170, 170, 96), 32),
        ("L1 192->64", (1, 40, 85, 85, 192), 64),
    ]
    rs = np.random.RandomState(0)
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        x = jnp.asarray(rs.rand(*xshape), dtype=DT)
        w = jnp.asarray(rs.rand(3, 3, 3, cin, cout) * 0.01, dtype=DT)
        g = jnp.asarray(rs.rand(*xshape[:4], cout), dtype=DT)
        flops = 2 * 27 * cin * cout * np.prod(xshape[:4])

        # CRITICAL: the wgrad primal inputs are (x, cotangent) — if both are
        # loop-invariant in the timing scan, XLA hoists the whole wgrad and
        # the measurement is fiction. Perturb x AND the cotangent by s.
        def vjp_w(fn, x, w, g, s):
            _, vjp = jax.vjp(lambda w_: fn(x + s.astype(DT), w_), w)
            return vjp(g * (1 + s).astype(DT))[0]

        def vjp_x(fn, x, w, g, s):
            _, vjp = jax.vjp(lambda x_: fn(x_ + s.astype(DT), w), x)
            return vjp(g * (1 + s).astype(DT))[0]

        if "wgrad" in which:
            for fn, lbl in [(conv3d_as_2d, "as2d-vjp"), (conv3d_ndhwc, "ndhwc-vjp")]:
                dt = timeit(lambda x, w, g, s, fn=fn: vjp_w(fn, x, w, g, s), (x, w, g), label=f"{name} wgrad {lbl}")
                print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)
            dt = timeit(lambda x, g, s: wgrad_direct_3d(x + s.astype(DT), g * (1 + s).astype(DT)), (x, g),
                        label=f"{name} wgrad direct-3d")
            print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)
            dt = timeit(lambda x, g, s: wgrad_direct_2d_taps(x + s.astype(DT), g * (1 + s).astype(DT)), (x, g),
                        label=f"{name} wgrad direct-2d-taps")
            print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)
        if "igrad" in which:
            for fn, lbl in [(conv3d_as_2d, "as2d-vjp"), (conv3d_ndhwc, "ndhwc-vjp")]:
                dt = timeit(lambda x, w, g, s, fn=fn: vjp_x(fn, x, w, g, s), (x, w, g), label=f"{name} igrad {lbl}")
                print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)
            dt = timeit(lambda g, w, s: igrad_direct_3d(g + s.astype(DT), w), (g, w), label=f"{name} igrad direct-3d")
            print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)
            dt = timeit(lambda g, w, s: igrad_direct_as2d(g + s.astype(DT), w), (g, w),
                        label=f"{name} igrad direct-as2d")
            print(f"   -> {flops/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["wgrad", "igrad"])
