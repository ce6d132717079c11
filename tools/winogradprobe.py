"""Transform-domain convolution probe: Winograd F(2x2, 3x3) and FFT.

The one conv-formulation class never measured in BENCH_NOTES (r4 verdict #2):
does a Winograd transform beat XLA's direct conv on v5e at the UNet3D shapes?

Theory: F(2x2, 3x3) computes a 2x2 output tile from a 4x4 input tile with 16
elementwise multiplies instead of 36 MACs -> 2.25x fewer MXU FLOPs. Inside the
as-2d 3D decomposition the input transform V = B^T d B is shared across the
three z-taps (each input plane is transformed ONCE; the z-fold runs in the
transform domain), so the transform overhead amortizes 3x.

Counter-hypothesis (why it should LOSE here): the GEMM contraction shrinks
from K = 9*Cin (direct conv's im2col) to K = 3*Cin per tile position, i.e.
16 skinny GEMMs instead of 3 well-fed ones, and the tile scatter/gather +
inverse-transform interleave are exactly the d2s-class layout copies measured
at 150-180 GB/s (BENCH_NOTES r4). The probe decides.

Timing discipline: convprobe.py's — N iterations per dispatch via lax.scan,
inputs varied per iteration by the scan key (x + s), random cotangents for the
grads (trap #2: a loop-invariant (x, cotangent) pair lets XLA hoist the whole
wgrad out of the loop and you measure fiction).

Usage: python tools/winogradprobe.py [check|fwd|grads|fft]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308)
BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def _weight_transform(w2):
    """w2 (3, 3, C, F) -> U (4, 4, C, F): U = G g G^T per (C, F) pair."""
    g = jnp.asarray(G, w2.dtype)
    return jnp.einsum("ai,ijcf,bj->abcf", g, w2, g)


def _input_transform(x):
    """x (B, H, W, C), H and W even -> V (4, 4, B, H/2, W/2, C).

    d[a, b] = the (a, b)-offset stride-2 slice of the padded plane (each 4x4
    input tile's element (a, b) across all tiles); V = B^T d B folds to +/-
    sums of those 16 slices (B's entries are 0, +-1), fully fusable adds.
    """
    B, H, W, C = x.shape
    th, tw = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    d = [[xp[:, a : a + 2 * th : 2, b : b + 2 * tw : 2, :] for b in range(4)] for a in range(4)]
    bt = jnp.asarray(BT, x.dtype)
    # V[a,b] = sum_{i,j} BT[a,i] * BT[b,j] * d[i,j] — unrolled (entries 0/±1)
    rows = []
    for a in range(4):
        row_ab = []
        for j in range(4):
            acc = None
            for i in range(4):
                c = float(BT[a, i])
                if c == 0.0:
                    continue
                t = d[i][j] if c == 1.0 else -d[i][j]
                acc = t if acc is None else acc + t
            row_ab.append(acc)
        out_ab = []
        for b in range(4):
            acc = None
            for j in range(4):
                c = float(BT[b, j])
                if c == 0.0:
                    continue
                t = row_ab[j] if c == 1.0 else -row_ab[j]
                acc = t if acc is None else acc + t
            out_ab.append(acc)
        rows.append(out_ab)
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)  # (4,4,B,th,tw,C)


def _inverse_transform(m):
    """m (4, 4, B, th, tw, F) -> y (B, 2*th, 2*tw, F): Y = A^T M A, then the
    2x2 tiles interleave back to the plane (the d2s-class copy)."""
    # A entries are 0/±1: unroll to adds
    rows = []
    for u in range(2):
        row = None
        for i in range(4):
            c = float(AT[u, i])
            if c == 0.0:
                continue
            t = m[i] if c == 1.0 else -m[i]
            row = t if row is None else row + t
        rows.append(row)  # (4, B, th, tw, F)
    out = []
    for u in range(2):
        cols = []
        for v in range(2):
            col = None
            for j in range(4):
                c = float(AT[v, j])
                if c == 0.0:
                    continue
                t = rows[u][j] if c == 1.0 else -rows[u][j]
                col = t if col is None else col + t
            cols.append(col)
        out.append(cols)
    y = jnp.stack([jnp.stack(c, -2) for c in out], -3)  # (B, th, tw, 2, 2, F)
    B, th, tw = y.shape[0], y.shape[1], y.shape[2]
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * th, 2 * tw, -1)


def winograd_conv2d(x, w2):
    """'same' 3x3 conv via F(2x2, 3x3). x (B, H, W, C) H,W even, w2 (3,3,C,F)."""
    V = _input_transform(x)  # (4,4,B,th,tw,C)
    U = _weight_transform(w2)  # (4,4,C,F)
    m = jnp.einsum("abpqrc,abcf->abpqrf", V, U)  # 16 GEMMs, K=C
    return _inverse_transform(m)


def winograd_conv3d(x, w, s):
    """3D 'same' conv: as-2d z-fold moved into the Winograd transform domain.

    Each input plane is transformed ONCE; the z-tap sum runs on the
    transformed tiles: M[z] = sum_dz V[z+dz-1] @ U[dz]. K grows from C to 3C
    by concatenating the three shifted V's channel-wise (the as-2d trick).
    """
    N, D, H, W, C = x.shape
    x = (x + s.astype(x.dtype)).reshape(N * D, H, W, C)
    V = _input_transform(x)  # (4,4,N*D,th,tw,C)
    th, tw = H // 2, W // 2
    V = V.reshape(4, 4, N, D, th, tw, C)
    Vp = jnp.pad(V, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # transform-domain z-fold: K = 3C via channel concat of the shifted planes
    V3 = jnp.concatenate([Vp[:, :, :, dz : dz + D] for dz in range(3)], axis=-1)
    U = jnp.concatenate([_weight_transform(w[dz]) for dz in range(3)], axis=2)  # (4,4,3C,F)
    m = jnp.einsum("abndpqc,abcf->abndpqf", V3, U)
    m = m.reshape(4, 4, N * D, th, tw, -1)
    y = _inverse_transform(m)
    return y.reshape(N, D, H, W, -1)


def conv3d_as_2d(x, w, s):
    """The shipping formulation (ops/conv.py): reference timing."""
    N, D, H, W, C = x.shape
    x = x + s.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = xp[:, dz : dz + D].reshape(N * D, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs, w[dz], (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = o if out is None else out + o
    return out.reshape(N, D, H, W, -1)


def fft_conv3d(x, w, s):
    """3D conv via FFT: spectrum once per input channel, channel GEMM per
    frequency bin, inverse per output channel. Hopeless for 3^3 kernels on
    paper (complex64 spectra = 8x the bf16 activation bytes, plus the FFTs);
    measured to close the formulation table."""
    N, D, H, W, C = x.shape
    x = (x + s.astype(x.dtype)).astype(jnp.float32)
    F = w.shape[-1]
    wf = jnp.flip(jnp.asarray(w, jnp.float32), (0, 1, 2))
    # 'same' 3x3x3 conv == circular conv of the 1-padded volume
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    shape = xp.shape[1:4]
    Xf = jnp.fft.rfftn(xp, s=shape, axes=(1, 2, 3))  # (N, D+2, H+2, Wf, C)
    Wf_ = jnp.fft.rfftn(wf, s=shape, axes=(0, 1, 2))  # (D+2, H+2, Wf, C, F)
    Yf = jnp.einsum("ndhwc,dhwcf->ndhwf", Xf, Wf_)
    y = jnp.fft.irfftn(Yf, s=shape, axes=(1, 2, 3))
    return y[:, 2 : 2 + D, 2 : 2 + H, 2 : 2 + W, :]


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


def wgrad(convfn, x, w, g, s):
    _, vjp = jax.vjp(lambda w_: convfn(x, w_, s), w)
    return vjp(g)[0]


def igrad(convfn, x, w, g, s):
    _, vjp = jax.vjp(lambda x_: convfn(x_, w, s), x)
    return vjp(g)[0]


def check():
    """fp32 correctness of the Winograd formulations vs XLA's conv."""
    rs = np.random.RandomState(0)
    x2 = jnp.asarray(rs.randn(4, 16, 20, 8), jnp.float32)
    w2 = jnp.asarray(rs.randn(3, 3, 8, 6) * 0.2, jnp.float32)
    ref2 = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got2 = winograd_conv2d(x2, w2)
    e2 = float(jnp.max(jnp.abs(got2 - ref2)))
    print(f"winograd2d max|err| = {e2:.2e}")
    assert e2 < 1e-4, e2

    x3 = jnp.asarray(rs.randn(1, 6, 16, 20, 8), jnp.float32)
    w3 = jnp.asarray(rs.randn(3, 3, 3, 8, 6) * 0.2, jnp.float32)
    z = jnp.float32(0)
    ref3 = conv3d_as_2d(x3, w3, z)
    got3 = winograd_conv3d(x3, w3, z)
    e3 = float(jnp.max(jnp.abs(got3 - ref3)))
    print(f"winograd3d max|err| = {e3:.2e}")
    assert e3 < 1e-4, e3

    gotf = fft_conv3d(x3, w3, z)
    ef = float(jnp.max(jnp.abs(gotf - ref3)))
    print(f"fft3d      max|err| = {ef:.2e}")
    assert ef < 1e-3, ef
    print("CHECK OK")


SHAPES = [
    ("full-res 96->32", (1, 80, 170, 170, 96), 32),
    ("full-res 32->32", (1, 80, 170, 170, 32), 32),
    ("L1 192->64", (1, 40, 86, 86, 192), 64),  # 86: Winograd wants even H,W
]

# FFT legs run at reduced spatial extents: the complex64 spectra are 8x the
# bf16 activation bytes, and at the canonical shapes above the spectrum pair
# alone blows past HBM (which is itself the first measurement). These are the
# largest same-channel-mix shapes that fit the blowup.
FFT_SHAPES = [
    ("fft-quarter 32->32", (1, 40, 86, 86, 32), 32),
    ("fft-L1 192->64", (1, 20, 44, 44, 192), 64),
]


def main(which):
    if "check" in which:
        check()
        return
    rs = np.random.RandomState(0)
    for name, xshape, cout in SHAPES:
        cin = xshape[-1]
        x = jnp.asarray(rs.rand(*xshape), DT)
        w = jnp.asarray(rs.rand(3, 3, 3, cin, cout) * 0.01, DT)
        g = jnp.asarray(rs.rand(*xshape[:4], cout), DT)
        flops = 2 * 27 * cin * cout * np.prod(xshape[:4])
        legs = []
        if "fwd" in which:
            legs += [("as-2d fwd", conv3d_as_2d, (x, w), 30),
                     ("winograd fwd", winograd_conv3d, (x, w), 30)]
        if "grads" in which:
            legs += [
                ("as-2d wgrad", lambda x, w, g, s: wgrad(conv3d_as_2d, x, w, g, s), (x, w, g), 10),
                ("winograd wgrad", lambda x, w, g, s: wgrad(winograd_conv3d, x, w, g, s), (x, w, g), 10),
                ("as-2d igrad", lambda x, w, g, s: igrad(conv3d_as_2d, x, w, g, s), (x, w, g), 10),
                ("winograd igrad", lambda x, w, g, s: igrad(winograd_conv3d, x, w, g, s), (x, w, g), 10),
            ]
        for label, fn, args, n in legs:
            dt = timeit(fn, args, n=n, label=f"{name} {label}")
            print(f"   -> {flops/dt/1e12:.1f} TFLOP/s (direct-conv FLOPs)", flush=True)
    if "fft" in which:
        for name, xshape, cout in FFT_SHAPES:
            cin = xshape[-1]
            x = jnp.asarray(rs.rand(*xshape), DT)
            w = jnp.asarray(rs.rand(3, 3, 3, cin, cout) * 0.01, DT)
            flops = 2 * 27 * cin * cout * np.prod(xshape[:4])
            for label, fn, args, n in [
                ("as-2d fwd", conv3d_as_2d, (x, w), 10),
                ("fft fwd", fft_conv3d, (x, w), 4),
            ]:
                dt = timeit(fn, args, n=n, label=f"{name} {label}")
                print(f"   -> {flops/dt/1e12:.1f} TFLOP/s (direct-conv FLOPs)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["check"])
