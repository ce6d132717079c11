"""Micro-benchmarks for 3D conv formulations on TPU (layout experiments).

Times representative UNet3D convs (forward and weight-gradient) under
different lowering strategies to find the fastest mapping onto the MXU.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def timeit(fn, args, n=30, label=""):
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
    av = float(acc)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.2f} ms ({av:.3f})", flush=True)
    return dt


def conv3d_ndhwc(x, w, s):
    return jax.lax.conv_general_dilated(
        x + s.astype(DT), w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_ncdhw(x, w, s):
    return jax.lax.conv_general_dilated(
        x + s.astype(DT), w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )


def conv3d_as_2d(x, w, s):
    # out[:, z] = sum_dz conv2d(x[:, z+dz-1], w[dz]); z folded into batch
    N, D, H, W, C = x.shape
    x = x + s.astype(DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = xp[:, dz : dz + D].reshape(N * D, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs, w[dz], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        out = o if out is None else out + o
    return out.reshape(N, D, H, W, -1)


def conv3d_outslice(x, w, s):
    # conv the full padded batch per tap; slice the OUTPUT (fusable) instead of
    # materializing three shifted input copies
    N, D, H, W, C = x.shape
    x = x + s.astype(DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0))).reshape(N * (D + 2), H, W, C)
    out = None
    for dz in range(3):
        o = jax.lax.conv_general_dilated(
            xp, w[dz], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(N, D + 2, H, W, -1)[:, dz : dz + D]
        out = o if out is None else out + o
    return out


def conv3d_packed(x, w, s):
    # one conv2d with kd*Cout output channels, then shifted-slice add:
    # identical FLOPs, 3x the lane packing for small Cout
    N, D, H, W, C = x.shape
    kd = w.shape[0]
    F = w.shape[-1]
    x = x + s.astype(DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    w_cat = jnp.moveaxis(w, 0, 3).reshape(3, 3, C, kd * F)
    o = jax.lax.conv_general_dilated(
        xp.reshape(N * (D + 2), H, W, C), w_cat, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    o = o.reshape(N, D + 2, H, W, kd, F)
    out = o[:, 0:D, :, :, 0, :] + o[:, 1:D+1, :, :, 1, :] + o[:, 2:D+2, :, :, 2, :]
    return out


def conv3d_tapfold(x, w, s):
    # one conv2d with kd*F output channels over ALL D planes (no depth pad),
    # then shifted lane-slice adds. Same FLOPs as as-2d, but the GEMM's output
    # dimension is kd*F lanes instead of F (3x MXU utilization at F=32). The
    # epilogue stays in flat channels (lane slices + pads) — the earlier
    # 'packed' variant lost to a rank-6 (kd, F)-minor reshape, not the GEMM.
    N, D, H, W, C = x.shape
    kd = w.shape[0]
    F = w.shape[-1]
    pd = 1
    x = x + s.astype(DT)
    w_cat = jnp.moveaxis(w, 0, 3).reshape(3, 3, C, kd * F)
    z = jax.lax.conv_general_dilated(
        x.reshape(N * D, H, W, C), w_cat, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(N, D, H, W, kd * F)
    d_out = D + 2 * pd - kd + 1
    out = None
    for dz in range(kd):
        lo = max(0, pd - dz)
        hi = min(d_out, D + pd - dz)
        sl = z[:, lo + dz - pd : hi + dz - pd, :, :, dz * F : (dz + 1) * F]
        sl = jnp.pad(sl, ((0, 0), (lo, d_out - hi), (0, 0), (0, 0), (0, 0)))
        out = sl if out is None else out + sl
    return out


def _conv2d(xs, w2):
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _tapfold_epilogue(z, kd, F, D, pd=1):
    N = z.shape[0]
    d_out = D + 2 * pd - kd + 1
    out = None
    for dz in range(kd):
        lo = max(0, pd - dz)
        hi = min(d_out, D + pd - dz)
        sl = z[:, lo + dz - pd : hi + dz - pd, :, :, dz * F : (dz + 1) * F]
        sl = jnp.pad(sl, ((0, 0), (lo, d_out - hi), (0, 0), (0, 0), (0, 0)))
        out = sl if out is None else out + sl
    return out


def _tapfold_epilogue2(z, F):
    # out[:, d] = z0[d-1] + z1[d] + z2[d+1]: fused interior add (no pad
    # materialization) + tiny edge planes, one concat along D
    D = z.shape[1]
    z0, z1, z2 = (z[..., i * F : (i + 1) * F] for i in range(3))
    interior = z0[:, : D - 2] + z1[:, 1 : D - 1] + z2[:, 2:]
    first = z1[:, :1] + z2[:, 1:2]
    last = z0[:, D - 2 : D - 1] + z1[:, D - 1 :]
    return jnp.concatenate([first, interior, last], axis=1)


def conv3d_tapfold2(x, w, s, pad_cout=False):
    # tapfold with the no-pad epilogue; optionally pads the folded output
    # channels up to a multiple of 128 (Cout=128 measured FASTER than 96)
    N, D, H, W, C = x.shape
    kd = w.shape[0]
    F = w.shape[-1]
    x = x + s.astype(DT)
    w_cat = jnp.moveaxis(w, 0, 3).reshape(3, 3, C, kd * F)
    if pad_cout and (kd * F) % 128 != 0 and kd * F < 128:
        w_cat = jnp.pad(w_cat, ((0, 0), (0, 0), (0, 0), (0, 128 - kd * F)))
    z = _conv2d(x.reshape(N * D, H, W, C), w_cat).reshape(N, D, H, W, -1)
    return _tapfold_epilogue2(z, F)


def conv3d_cinsplit_tapfold(x, w, s, chunk=32):
    # sum over 32-wide input-channel chunks of tapfolded conv2ds: every GEMM
    # is the (Cin=32 -> Cout=kd*F, K=288) shape measured fast (igrad profile)
    N, D, H, W, C = x.shape
    kd = w.shape[0]
    F = w.shape[-1]
    x = x + s.astype(DT)
    w_cat = jnp.moveaxis(w, 0, 3).reshape(3, 3, C, kd * F)
    xs = x.reshape(N * D, H, W, C)
    z = None
    for c0 in range(0, C, chunk):
        zc = _conv2d(xs[..., c0 : c0 + chunk], w_cat[:, :, c0 : c0 + chunk])
        z = zc if z is None else z + zc
    z = z.reshape(N, D, H, W, kd * F)
    return _tapfold_epilogue(z, kd, F, D)


def conv3d_cinsplit(x, w, s, chunk=32):
    # as-2d with the input channels additionally split into 32-wide chunks
    N, D, H, W, C = x.shape
    x = x + s.astype(DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = xp[:, dz : dz + D].reshape(N * D, H, W, C)
        for c0 in range(0, C, chunk):
            o = _conv2d(xs[..., c0 : c0 + chunk], w[dz][:, :, c0 : c0 + chunk])
            out = o if out is None else out + o
    return out.reshape(N, D, H, W, -1)


def wgrad(convfn, x, w, g, s):
    """dL/dw with a RANDOM cotangent g. A constant cotangent (sum-loss grad)
    lets XLA fold the backward conv of a broadcast operand — numbers measured
    that way are fiction (a 'conv' with constant input is a box filter)."""
    _, vjp = jax.vjp(lambda w_: convfn(x, w_, s), w)
    return vjp(g)[0]


def igrad(convfn, x, w, g, s):
    """dL/dx with a RANDOM cotangent g (see wgrad note)."""
    _, vjp = jax.vjp(lambda x_: convfn(x_, w, s), x)
    return vjp(g)[0]


def main(which):
    shapes = [
        ("full-res 96->32", (1, 80, 170, 170, 96), 32),
        ("full-res 16->32", (1, 80, 170, 170, 16), 32),
        ("L1 192->64", (1, 40, 85, 85, 192), 64),
    ]
    rs = np.random.RandomState(0)
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        x = jnp.asarray(rs.rand(*xshape), dtype=DT)
        w = jnp.asarray(rs.rand(3, 3, 3, cin, cout) * 0.01, dtype=DT)
        g = jnp.asarray(rs.rand(*xshape[:4], cout), dtype=DT)
        flops = 2 * 27 * cin * cout * np.prod(xshape[:4])
        if "ndhwc" in which:
            dt = timeit(conv3d_ndhwc, (x, w), label=f"{name} ndhwc fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, s: wgrad(conv3d_ndhwc, x, w, s), (x, w), n=10, label=f"{name} ndhwc wgrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "conv2d" in which:
            dt = timeit(conv3d_as_2d, (x, w), label=f"{name} as-2d fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, g, s: wgrad(conv3d_as_2d, x, w, g, s), (x, w, g), n=10, label=f"{name} as-2d wgrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "outslice" in which:
            dt = timeit(conv3d_outslice, (x, w), label=f"{name} outslice fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, s: wgrad(conv3d_outslice, x, w, s), (x, w), n=10, label=f"{name} outslice wgrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "packed" in which:
            dt = timeit(conv3d_packed, (x, w), label=f"{name} packed fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, s: wgrad(conv3d_packed, x, w, s), (x, w), n=10, label=f"{name} packed wgrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "tapfold" in which:
            dt = timeit(conv3d_tapfold, (x, w), label=f"{name} tapfold fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, g, s: wgrad(conv3d_tapfold, x, w, g, s), (x, w, g), n=10, label=f"{name} tapfold wgrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "igrad" in which:
            dt = timeit(lambda x, w, g, s: igrad(conv3d_as_2d, x, w, g, s), (x, w, g), n=10, label=f"{name} as-2d igrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
            dt = timeit(lambda x, w, g, s: igrad(conv3d_tapfold, x, w, g, s), (x, w, g), n=10, label=f"{name} tapfold igrad")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "tapfold2" in which:
            for fn, label in [(conv3d_tapfold2, "tapfold2"),
                              (lambda x, w, s: conv3d_tapfold2(x, w, s, pad_cout=True), "tapfold2-p128")]:
                dt = timeit(fn, (x, w), label=f"{name} {label} fwd")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
                dt = timeit(lambda x, w, g, s, fn=fn: wgrad(fn, x, w, g, s), (x, w, g), n=10,
                            label=f"{name} {label} wgrad")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
                dt = timeit(lambda x, w, g, s, fn=fn: igrad(fn, x, w, g, s), (x, w, g), n=10,
                            label=f"{name} {label} igrad")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "cinsplit" in which and cin > 32:
            for fn, label in [(conv3d_cinsplit, "cinsplit"), (conv3d_cinsplit_tapfold, "cinsplit-tap")]:
                dt = timeit(fn, (x, w), label=f"{name} {label} fwd")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
                dt = timeit(lambda x, w, g, s, fn=fn: wgrad(fn, x, w, g, s), (x, w, g), n=10,
                            label=f"{name} {label} wgrad")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
                dt = timeit(lambda x, w, g, s, fn=fn: igrad(fn, x, w, g, s), (x, w, g), n=10,
                            label=f"{name} {label} igrad")
                print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)
        if "ncdhw" in which:
            xt = jnp.moveaxis(x, -1, 1)
            wt = jnp.transpose(w, (4, 3, 0, 1, 2))
            dt = timeit(conv3d_ncdhw, (xt, wt), label=f"{name} ncdhw fwd")
            print(f"   -> {flops/dt/1e12:.1f} TFLOPs", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["ndhwc", "conv2d"])
