"""TPU-tuned 3D convolution: decomposition into a sum of 2D convolutions.

XLA:TPU's Conv2D lowering is substantially better optimized than Conv3D for
the channel-narrow convs of a U-Net. Measured on v5e (tools/convprobe.py,
bf16, full-resolution 80x170x170 activations):

| conv            | Conv3D fwd | as-2D fwd | Conv3D wgrad | as-2D wgrad |
|-----------------|-----------:|----------:|-------------:|------------:|
| 96->32 full-res | 21.4 TF/s  | 45.8 TF/s |  11.0 TF/s   |  42.8 TF/s  |
| 16->32 full-res | 10.4       | 18.6      |   2.5        |  11.8       |
| 192->64 L1      | 37.2       | 47.9      |  18.5        |  38.4       |

The identity: out[:, z] = sum_dz conv2d(x_padded[:, z+dz], W[dz]) — the depth
axis folds into the conv batch, each depth-tap of the kernel becomes one 2D
conv, and the backward pass (autodiff through pad/slice/conv2d) inherits the
fast 2D gradient path.

The parameter layout is identical to a plain 3D conv kernel
(kd, kh, kw, in, out), so checkpoints are interchangeable with the
reference-interop path (utils/torch_interop.py).
"""

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from collections.abc import Sequence

from pytorch3dunet_tpu.ops.packed import PackedArray


def _conv2d_nhwc(xs, w2, ph, pw):
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(ph, ph), (pw, pw)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _as2d(x, kernel, meta):
    """Decomposed 3D conv: one 2D conv per depth tap over shifted slices."""
    kd, kh, kw, pd, ph, pw = meta
    N, D, H, W, C = x.shape
    F = kernel.shape[-1]
    if pd:
        xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    else:
        xp = x
    d_out = D + 2 * pd - kd + 1
    out = None
    for dz in range(kd):
        xs = xp[:, dz : dz + d_out].reshape(N * d_out, H, W, C)
        o = _conv2d_nhwc(xs, kernel[dz], ph, pw)
        out = o if out is None else out + o
    h_out, w_out = out.shape[1], out.shape[2]
    return out.reshape(N, d_out, h_out, w_out, F)


def _tapfold(x, kernel, meta):
    """Tap-folded 3D conv: ONE 2D conv with kd*F output channels over all
    planes, then depth-shifted channel-block adds. Same FLOPs as _as2d; the
    single wide GEMM keeps more of the MXU busy when F >= 64 (measured on
    v5e: L1 conv fwd 3.24 ms vs 4.11 ms, tools/convprobe.py)."""
    kd, kh, kw, pd, ph, pw = meta
    N, D, H, W, C = x.shape
    F = kernel.shape[-1]
    w_cat = jnp.moveaxis(kernel, 0, 3).reshape(kh, kw, C, kd * F)
    z = _conv2d_nhwc(x.reshape(N * D, H, W, C), w_cat, ph, pw)
    h_out, w_out = z.shape[1], z.shape[2]
    z = z.reshape(N, D, h_out, w_out, kd * F)
    d_out = D + 2 * pd - kd + 1
    out = None
    for dz in range(kd):
        lo = max(0, pd - dz)
        hi = min(d_out, D + pd - dz)
        sl = z[:, lo + dz - pd : hi + dz - pd, :, :, dz * F : (dz + 1) * F]
        sl = jnp.pad(sl, ((0, 0), (lo, d_out - hi), (0, 0), (0, 0), (0, 0)))
        out = sl if out is None else out + sl
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3d_mixed(x, kernel, meta, use_tapfold):
    """Forward uses the formulation that measures fastest for the shape; the
    backward always differentiates the as-2d form (both compute the same
    function, so the as-2d VJP is exact — its wgrad measures faster)."""
    if use_tapfold:
        return _tapfold(x, kernel, meta)
    return _as2d(x, kernel, meta)


def _conv3d_mixed_fwd(x, kernel, meta, use_tapfold):
    return _conv3d_mixed(x, kernel, meta, use_tapfold), (x, kernel)


def _conv3d_mixed_bwd(meta, use_tapfold, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda x_, k_: _as2d(x_, k_, meta), x, kernel)
    return vjp(g)


_conv3d_mixed.defvjp(_conv3d_mixed_fwd, _conv3d_mixed_bwd)


def _use_tapfold(features: int, kd: int) -> bool:
    # off by default: the isolated L1-conv forward win (3.24 vs 4.11 ms)
    # did not survive composition with the surrounding ops (BENCH_NOTES r2)
    return (
        os.environ.get("P3DUNET_TAPFOLD", "0") == "1"
        and features >= 64
        and kd > 1
    )


class Conv3D(nn.Module):
    """Stride-1 3D convolution computed as kd stacked 2D convolutions.

    Accepts either a plain (N, D, H, W, C) tensor or a lane-packed
    (N, D, H, W*C) PackedArray; both feed the 2D convs through pure
    bitcast reshapes (identical row-major order), so the conv path is the
    same either way and the output stays in the caller's representation.
    """

    features: int
    kernel_size: tuple = (3, 3, 3)
    padding: tuple = (1, 1, 1)
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        pd, ph, pw = self.padding
        packed = isinstance(x, PackedArray)
        N, D, H, W, C = x.shape
        buf = x.data if packed else x

        kernel = self.param("kernel", self.kernel_init, (kd, kh, kw, C, self.features), jnp.float32)
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            buf = buf.astype(self.dtype)

        x5 = buf.reshape(N, D, H, W, C)  # bitcast for packed inputs
        meta = (kd, kh, kw, pd, ph, pw)

        # spatial model parallelism: when tracing under a 'space' mesh axis
        # (parallel/spatial.py), fetch one halo plane per side from the
        # neighbor shards over ICI and convolve without depth padding
        from pytorch3dunet_tpu.parallel.spatial import active_spatial_axis, halo_exchange_d

        sp_axis = active_spatial_axis()
        if sp_axis is not None and kd > 1:
            assert pd == (kd - 1) // 2, "spatial sharding requires 'same' depth padding"
            x5 = halo_exchange_d(x5, sp_axis, pd)
            meta = (kd, kh, kw, 0, ph, pw)

        if _use_tapfold(self.features, kd):
            # custom_vjp: tapfold forward, as-2d backward
            out = _conv3d_mixed(x5, kernel, meta, True)
        else:
            # plain autodiff through the as-2d decomposition (default: the
            # custom_vjp indirection itself measured ~1% slower end-to-end)
            out = _as2d(x5, kernel, meta)

        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            out = out + bias

        if packed:
            N_, d_out, h_out, w_out, F = out.shape
            return PackedArray(out.reshape(N_, d_out, h_out, w_out * F), F)
        return out


class Conv2D(nn.Module):
    """2D convolution with nn.Conv's parameter layout ('kernel' HWIO, 'bias'),
    additionally accepting lane-packed (N, H, W*C) PackedArray activations."""

    features: int
    kernel_size: tuple = (3, 3)
    padding: tuple = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        packed = isinstance(x, PackedArray)
        N, H, W, C = x.shape
        buf = x.data.reshape(N, H, W, C) if packed else x

        kernel = self.param("kernel", self.kernel_init, (kh, kw, C, self.features), jnp.float32)
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            buf = buf.astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            buf,
            kernel,
            window_strides=(1, 1),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            out = out + bias

        if packed:
            h_out, w_out = out.shape[1], out.shape[2]
            return PackedArray(out.reshape(N, h_out, w_out * self.features), self.features)
        return out


def conv_nd(features, kernel_size, padding, use_bias, dtype, kernel_init, name, spatial_rank):
    """Conv module factory: decomposed Conv3D for rank 3, nn.Conv for rank 2."""
    if isinstance(kernel_size, Sequence):
        kernel = tuple(int(k) for k in kernel_size)
    else:
        kernel = (int(kernel_size),) * spatial_rank
    if isinstance(padding, Sequence):
        pad = tuple(int(p) for p in padding)
    else:
        pad = (int(padding),) * spatial_rank

    if spatial_rank == 3:
        return Conv3D(
            features,
            kernel_size=kernel,
            padding=pad,
            use_bias=use_bias,
            dtype=dtype,
            kernel_init=kernel_init,
            name=name,
        )
    return Conv2D(
        features,
        kernel_size=kernel,
        padding=pad,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init,
        name=name,
    )
