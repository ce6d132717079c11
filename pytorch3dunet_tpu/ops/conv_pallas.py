"""Pallas TPU kernel: fused 3x3x3 stride-1 convolution forward (tap-folded).

Why XLA is not enough (measured on v5e, tools/convprobe.py + conv2dgrid.py):
XLA's conv2d achieves ~114 TF/s when Cout=128 but only ~36-46 TF/s at the
UNet's Cout=32 — output channels are nearly free up to a full 128-lane tile,
so the classic decomposition (3 conv2ds of Cout=F summed over depth taps)
wastes 3/4 of the MXU. Folding the 3 depth taps into the GEMM's output
dimension (Cout=3F) fixes the utilization, but in XLA the tap-unfold epilogue
(channel-sliced, depth-shifted adds) forces a relayout of the 3F intermediate
through HBM that eats the entire gain (convprobe 'tapfold' variants).

This kernel keeps the folded GEMM AND its epilogue on-chip:

    grid (h_tile, padded_plane p):
        DMA x rows [h*TH, h*TH+TH+2) of plane p into VMEM
        P = im2col patches (TH*W, 9C)               # VPU shifts, on-chip
        z = P @ w_cat (9C, 3F)                      # ONE MXU dot, N=3F lanes
        ring[p   % 3]  = z[:,    :F]                # out_{p}   first term
        ring[p-1 % 3] += z[:,  F:2F]                # out_{p-1} second term
        out_{p-2}      = ring[p-2 % 3] + z[:, 2F:]  # emit, bf16, bias fused

The ring lives in VMEM scratch (persistent across the sequential grid), so
the 3F-channel intermediate never exists in HBM. f32 accumulation throughout.

Backward stays on XLA's (fast-enough) decomposition via jax.custom_vjp in
ops/conv.py — both formulations compute the same function, so the as-2d VJP
is the exact gradient of this forward.

Replaces the hot conv of the reference train loop
(pytorch3dunet/unet3d/buildingblocks.py:56-58 nn.Conv3d) on the TPU path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to exercise the kernel in interpreter mode on CPU
_INTERPRET = False


def _choose_th(h: int) -> int | None:
    """Rows of output H per tile: a divisor of H in a VMEM-friendly range."""
    for th in (16, 10, 8, 17, 20, 5, 4, 13, 11, 7, 32, 2):
        if th <= h and h % th == 0:
            return th
    return None


def _fwd_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, ring, sem, *, TH, W, C, F):
    h = pl.program_id(0)
    p = pl.program_id(1)  # depth-padded plane index: 0 .. D+1

    # DMA'd regions must be tile-aligned (sublane dim a multiple of 8, lane
    # dim a multiple of 128): the caller pads x to WP x CP; the padding lanes
    # are dropped during patch assembly so the MXU never multiplies them
    dma = pltpu.make_async_copy(x_hbm.at[p, pl.ds(h * TH, TH + 2)], x_vmem, sem)
    dma.start()
    dma.wait()

    # im2col: (TH*W, 9C) patch matrix from shifted windows (VPU copies)
    pieces = []
    for kh in range(3):
        for kw in range(3):
            xs = x_vmem[kh : kh + TH, kw : kw + W, :C]
            pieces.append(xs.reshape(TH * W, C))
    patches = jnp.concatenate(pieces, axis=1)

    z = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)  # (TH*W, 3F)

    s0 = jax.lax.rem(p, 3)
    s1 = jax.lax.rem(p + 2, 3)  # (p-1) mod 3, non-negative
    s2 = jax.lax.rem(p + 1, 3)  # (p-2) mod 3

    ring[s0] = z[:, 0:F]

    @pl.when(p >= 1)
    def _():
        ring[s1] = ring[s1] + z[:, F : 2 * F]

    @pl.when(p >= 2)
    def _():
        acc = ring[s2] + z[:, 2 * F : 3 * F] + b_ref[:].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype).reshape(1, TH, W, F)


@functools.partial(jax.jit, static_argnames=("th",))
def _conv3d_fwd_impl(x, w, b, th):
    """x: (D, H, W, C); w: (3, 3, 3, C, F); b: (F,) -> (D, H, W, F)."""
    D, H, W, C = x.shape
    F = w.shape[-1]
    TH = th

    # depth/height/width pad by 1 (torch padding=1 semantics); the padded
    # width rounds up to a multiple of 8 and the channel dim to a multiple of
    # 128 so DMA'd regions stay tile-aligned (extra lanes never reach the MXU)
    wp = -(-(W + 2) // 8) * 8
    cp = -(-C // 128) * 128
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - W - 1), (0, cp - C)))
    # (kd, kh, kw, C, F) -> (kh, kw, C, kd, F) -> (9C, 3F): patch rows are
    # ordered (kh, kw, c); folded output channels are ordered (kd, f)
    w_cat = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(9 * C, 3 * F)
    b2 = b.reshape(1, F)

    grid = (H // TH, D + 2)
    kernel = functools.partial(_fwd_kernel, TH=TH, W=W, C=C, F=F)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((9 * C, 3 * F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, F),
            lambda h, p: (jnp.maximum(p - 2, 0), h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, wp, cp), x.dtype),
            pltpu.VMEM((3, TH * W, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xp, w_cat, b2)


def _fwd_kernel_roll(x_hbm, w_ref, b_ref, out_ref, x_vmem, ring, sem, *, TH, W, WP, C, F):
    """Variant 2: tap shifts via contiguous flat-buffer rolls instead of
    im2col. x_vmem is viewed as ((TH+2)*WP, C); the (kh, kw) tap's patch rows
    live at a contiguous sublane offset kh*WP + kw, so each tap is one roll +
    one accumulating (M, C) @ (C, 3F) dot. Output columns j >= W are garbage
    from the row wrap and are cropped at emit."""
    h = pl.program_id(0)
    p = pl.program_id(1)

    # one spare row-chunk beyond the TH+2 DMA'd rows: the last tap's flat
    # slice reads 2 rows past the block (they only feed cropped columns)
    dma = pltpu.make_async_copy(x_hbm.at[p, pl.ds(h * TH, TH + 2)], x_vmem.at[pl.ds(0, TH + 2)], sem)
    dma.start()
    dma.wait()

    cp = x_vmem.shape[-1]
    x_flat = x_vmem[:].reshape((TH + 3) * WP, cp)[:, :C]
    m = TH * WP
    z = None
    for kh in range(3):
        for kw in range(3):
            off = kh * WP + kw
            shifted = x_flat[off : off + m]
            zz = jax.lax.dot_general(
                shifted, w_ref[pl.ds((kh * 3 + kw) * C, C), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = zz if z is None else z + zz

    s0 = jax.lax.rem(p, 3)
    s1 = jax.lax.rem(p + 2, 3)
    s2 = jax.lax.rem(p + 1, 3)
    ring[s0] = z[:, 0:F]

    @pl.when(p >= 1)
    def _():
        ring[s1] = ring[s1] + z[:, F : 2 * F]

    @pl.when(p >= 2)
    def _():
        acc = ring[s2] + z[:, 2 * F : 3 * F] + b_ref[:].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype).reshape(1, TH, WP, F)[:, :, :W, :]


@functools.partial(jax.jit, static_argnames=("th",))
def _conv3d_fwd_impl_roll(x, w, b, th):
    """Roll-variant driver; same contract as _conv3d_fwd_impl."""
    D, H, W, C = x.shape
    F = w.shape[-1]
    TH = th
    wp = -(-(W + 2) // 8) * 8
    cp = -(-C // 128) * 128
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - W - 1), (0, cp - C)))
    w_cat = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(9 * C, 3 * F)
    b2 = b.reshape(1, F)

    grid = (H // TH, D + 2)
    kernel = functools.partial(_fwd_kernel_roll, TH=TH, W=W, WP=wp, C=C, F=F)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * C, 3 * F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, F),
            lambda h, p: (jnp.maximum(p - 2, 0), h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 3, wp, cp), x.dtype),
            pltpu.VMEM((3, TH * wp, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xp, w_cat, b2)


def _fwd_kernel_packw(x_hbm, w_ref, b_ref, out_ref, x_vmem, ring, sem, *, TH, W, WP, C, F):
    """Variant 3 ('packw'): ONE fat dot per tile with zero wasted MACs.

    K packs the 3 kh taps (3C rows of the weight matrix), N packs kd*kw*F
    (9F columns); the kw tap-shift moves to a cheap f32 epilogue of flat
    row-shifted adds, and kd ring-accumulates across planes as usual.
    GEMM per tile: (M+2, 3C) @ (3C, 9F) — for C=32 that is K=96, N=288:
    full output lanes where the per-tap roll variant ran K=32, N=96 dots.

      P[m, (kh c)]     = x_flat[m + kh*WP, c]
      z[m, (kd kw f)]  = P @ Wp
      out_kd[m]        = sum_kw z[m + kw, (kd, kw, :)]   (flat row shifts)

    Row-wrap garbage only ever lands in columns j >= W (WP >= W + 2), which
    are cropped at emit."""
    h = pl.program_id(0)
    p = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[p, pl.ds(h * TH, TH + 2)], x_vmem.at[pl.ds(0, TH + 2)], sem
    )
    dma.start()
    dma.wait()

    cp = x_vmem.shape[-1]
    x_flat = x_vmem[:].reshape((TH + 3) * WP, cp)
    M = TH * WP
    M2 = M + 8  # sublane-aligned; rows beyond M+2 only feed cropped columns

    patches = jnp.concatenate(
        [x_flat[kh * WP : kh * WP + M2, :C] for kh in range(3)], axis=1
    )  # (M2, 3C)
    z = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)  # (M2, 9F)

    def block(kd):
        acc = None
        for kw in range(3):
            sl = z[kw : kw + M, (kd * 3 + kw) * F : (kd * 3 + kw + 1) * F]
            acc = sl if acc is None else acc + sl
        return acc

    s0 = jax.lax.rem(p, 3)
    s1 = jax.lax.rem(p + 2, 3)
    s2 = jax.lax.rem(p + 1, 3)
    ring[s0] = block(0)

    @pl.when(p >= 1)
    def _():
        ring[s1] = ring[s1] + block(1)

    @pl.when(p >= 2)
    def _():
        acc = ring[s2] + block(2) + b_ref[:].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype).reshape(1, TH, WP, F)[:, :, :W, :]


@functools.partial(jax.jit, static_argnames=("th",))
def _conv3d_fwd_impl_packw(x, w, b, th):
    """packw-variant driver; same contract as _conv3d_fwd_impl."""
    D, H, W, C = x.shape
    F = w.shape[-1]
    TH = th
    wp = -(-(W + 2) // 8) * 8
    cp = -(-C // 128) * 128
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wp - W - 1), (0, cp - C)))
    # rows (kh, c); cols (kd, kw, f)
    w_cat = jnp.transpose(w, (1, 3, 0, 2, 4)).reshape(3 * C, 9 * F)
    b2 = b.reshape(1, F)

    grid = (H // TH, D + 2)
    kernel = functools.partial(_fwd_kernel_packw, TH=TH, W=W, WP=wp, C=C, F=F)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3 * C, 9 * F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda h, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, F),
            lambda h, p: (jnp.maximum(p - 2, 0), h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 3, wp, cp), x.dtype),
            pltpu.VMEM((3, TH * wp, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xp, w_cat, b2)


def supported(x_shape, kernel_size, padding, backend=None) -> bool:
    """Whether the fused forward kernel covers this conv instance."""
    if not (_INTERPRET or (backend or jax.default_backend()) == "tpu"):
        return False
    if tuple(kernel_size) != (3, 3, 3) or tuple(padding) != (1, 1, 1):
        return False
    N, D, H, W, C = x_shape
    if D < 2:
        return False
    return _choose_th(H) is not None


def conv3d_fwd(x, w, b=None, variant: str = "roll"):
    """Batched fused forward: x (N, D, H, W, C), w (3,3,3,C,F), b (F,) or None.

    Status (v5e, 96->32 full-res, tools/pallasconvprobe.py): 'roll'
    (contiguous-slice taps, 9 accumulating dots) runs 13.3 ms; 'im2col'
    (strided-window patch matrix, one K=9C dot) runs 34 ms; XLA's as-2d
    decomposition runs 8.4 ms and remains the production path. Experimental.
    """
    N = x.shape[0]
    F = w.shape[-1]
    th = _choose_th(x.shape[2])
    impl = {
        "roll": _conv3d_fwd_impl_roll,
        "packw": _conv3d_fwd_impl_packw,
        "im2col": _conv3d_fwd_impl,
    }[variant]
    if b is None:
        b = jnp.zeros((F,), jnp.float32)
    b = b.astype(x.dtype)
    w = w.astype(x.dtype)
    if N == 1:
        return impl(x[0], w, b, th)[None]
    return jax.lax.map(lambda xi: impl(xi, w, b, th), x)
