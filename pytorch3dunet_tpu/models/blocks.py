"""U-Net building blocks as Flax modules (channels-last, TPU-first).

Capability parity with the reference block DSL
(pytorch3dunet/unet3d/buildingblocks.py): the `layer_order` string drives the
composition of each conv unit — 'c' Conv, 'g' GroupNorm, 'b' BatchNorm,
'r' ReLU, 'l' LeakyReLU, 'e' ELU, 'd' Dropout, 'D' channel-Dropout — with the
same channel-scheduling rules (DoubleConv encoder halving, ResNet residual
projection, decoder concat-vs-sum joining).

Design differences from the reference (deliberate, TPU-first):
- tensors are channels-last (N, [D,] H, W, C) so XLA tiles convs onto the MXU
  without layout transposes;
- GroupNorm statistics are always computed in float32 even when the compute
  dtype is bfloat16;
- modules are pure functions of params — no in-place ops, no `.train()` flags;
  dropout takes an explicit rng via flax.
"""

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch3dunet_tpu.models.se import ChannelSELayer3D, ChannelSpatialSELayer3D, SpatialSELayer3D
from pytorch3dunet_tpu.ops import packed as packed_ops
from pytorch3dunet_tpu.ops.conv import conv_nd
from pytorch3dunet_tpu.ops.interp import resize_spatial
from pytorch3dunet_tpu.ops.packed import PackedArray, pack, unpack
from pytorch3dunet_tpu.ops.pool import avg_pool, max_pool

# matches torch's default kaiming_uniform(a=sqrt(5)) conv init: U(+-sqrt(1/fan_in))
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _to_tuple(v, rank: int) -> tuple[int, ...]:
    if isinstance(v, Sequence):
        t = tuple(int(x) for x in v)
        assert len(t) == rank, f"Expected length-{rank} tuple, got {t}"
        return t
    return (int(v),) * rank


def _apply_activation(char: str, x):
    if isinstance(x, PackedArray):
        return packed_ops.map_data(x, lambda d: _apply_activation(char, d))
    if char == "r":
        return nn.relu(x)
    if char == "l":
        return nn.leaky_relu(x, negative_slope=0.01)
    if char == "e":
        return nn.elu(x)
    raise ValueError(f"Unknown activation char: {char}")


import os as _os

_USE_RESHAPE_POOL = _os.environ.get("P3DUNET_RESHAPE_POOL", "1") == "1"


class DenseGroupNorm(nn.Module):
    """GroupNorm via plain axis reductions (ops/packed.py group_norm_act_dense):
    avoids flax GroupNorm's big-tensor reshape, which costs layout copies on
    TPU, and supports psum'd statistics under spatial model parallelism.
    Parameter names match flax GroupNorm ('scale'/'bias')."""

    num_groups: int
    act: str = "none"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        return packed_ops.group_norm_act_dense(
            x, scale, bias, self.num_groups, 1e-5, self.act, axis_name=self.axis_name
        )


class PackedGroupNorm(nn.Module):
    """GroupNorm on a lane-packed activation (fp32 stats, torch eps=1e-5).

    Parameter names match flax GroupNorm ('scale'/'bias') so checkpoints are
    interchangeable with the unpacked path.
    """

    num_groups: int
    act: str = "none"

    @nn.compact
    def __call__(self, p: PackedArray) -> PackedArray:
        c = p.channels
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        return packed_ops.group_norm_act(p, scale, bias, self.num_groups, 1e-5, self.act)


def group_norm(x, num_channels: int, num_groups: int, name: str, act: str = "none"):
    """GroupNorm with torch semantics (eps=1e-5) and fp32 statistics."""
    if num_channels < num_groups:
        num_groups = 1
    assert num_channels % num_groups == 0, (
        f"Expected number of channels in input to be divisible by num_groups. "
        f"num_channels={num_channels}, num_groups={num_groups}"
    )
    from pytorch3dunet_tpu.parallel.spatial import active_spatial_axis

    if isinstance(x, PackedArray):
        # PackedGroupNorm has no psum wiring: per-shard statistics would
        # silently diverge (validate_spatial_model also rejects this combo)
        assert active_spatial_axis() is None, "packed GN is unsupported under spatial sharding"
        return PackedGroupNorm(num_groups=num_groups, act=act, name=name)(x)

    sp_axis = active_spatial_axis()
    if sp_axis is not None:
        # spatial model parallelism: statistics psum over the shard axis
        return DenseGroupNorm(num_groups=num_groups, act=act, axis_name=sp_axis, name=name)(x)
    # Dense (reshape-free) GN with a compute-dtype apply: avoids the fp32
    # full-volume materialization flax GN induces in bf16 (stats and apply
    # share the .astype(f32)), but measured NEUTRAL end-to-end on v5e
    # (23.90 vs 23.77 Mvox/s — the GN passes are latency-hidden), so the
    # lower-rounding flax path stays the default. P3DUNET_DENSE_GN=1 enables.
    if _os.environ.get("P3DUNET_DENSE_GN", "0") == "1":
        return DenseGroupNorm(num_groups=num_groups, act=act, name=name)(x)
    orig_dtype = x.dtype
    out = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, dtype=jnp.float32, name=name)(x.astype(jnp.float32))
    out = out.astype(orig_dtype)
    if act != "none":
        out = {"relu": nn.relu, "elu": nn.elu}.get(act, lambda v: nn.leaky_relu(v, 0.01))(out)
    return out


class DenseBatchNorm(nn.Module):
    """BatchNorm with flax-exact statistics and running-average updates but a
    compute-dtype apply: the flax path upcasts the whole activation to fp32
    (stats and the normalized output share the .astype(f32)), materializing a
    full-volume fp32 copy per norm in bf16 models. Here the fp32 stats
    reductions consume the bf16 tensor directly (the convert fuses into the
    reduce) and the normalization is a per-channel affine in the compute
    dtype. Scope-compatible with nn.BatchNorm ('scale'/'bias' params,
    'mean'/'var' in batch_stats). Opt-in via P3DUNET_DENSE_BN=1."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            x32 = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            mean = x32.mean(red)
            var = jnp.maximum((x32 * x32).mean(red) - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        a = jax.lax.rsqrt(var + 1e-5) * scale
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class SingleConv(nn.Module):
    """One conv unit assembled from the `order` DSL string.

    Reference behavior: buildingblocks.py:10-135 — conv bias only when no
    norm layer is present; a norm before the conv normalizes `in_channels`,
    after the conv it normalizes `out_channels`.
    """

    out_channels: int
    kernel_size: int | tuple = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int | tuple = 1
    dropout_prob: float = 0.1
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert "c" in self.order, "Conv layer MUST be present"
        assert self.order[0] not in "rle", "Non-linearity cannot be the first operation in the layer"
        in_channels = x.shape[-1]
        kernel = _to_tuple(self.kernel_size, self.spatial_rank)
        pad = _to_tuple(self.padding, self.spatial_rank)
        use_bias = not ("g" in self.order or "b" in self.order)
        conv_index = self.order.index("c")

        _FUSED_ACTS = {"r": "relu", "l": "leaky01", "e": "elu"}
        skip_next = False
        for i, char in enumerate(self.order):
            if skip_next:
                skip_next = False
                continue
            if char in "rle":
                x = _apply_activation(char, x)
            elif char == "c":
                x = conv_nd(
                    self.out_channels,
                    kernel_size=kernel,
                    padding=pad,
                    use_bias=use_bias,
                    dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name="conv",
                    spatial_rank=self.spatial_rank,
                )(x)
            elif char == "g":
                num_channels = in_channels if i < conv_index else self.out_channels
                # fuse a directly-following activation into the norm kernel
                nxt = self.order[i + 1] if i + 1 < len(self.order) else ""
                act = _FUSED_ACTS.get(nxt, "none")
                skip_next = act != "none"
                x = group_norm(x, num_channels, self.num_groups, name="groupnorm", act=act)
            elif char == "b":
                num_channels = in_channels if i < conv_index else self.out_channels
                if not isinstance(x, PackedArray) and _os.environ.get("P3DUNET_DENSE_BN", "0") == "1":
                    x = DenseBatchNorm(num_channels, name="batchnorm")(x, train=train)
                else:
                    bn = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=jnp.float32,
                        name="batchnorm",
                    )
                    if isinstance(x, PackedArray):
                        x = pack(bn(unpack(x).astype(jnp.float32)).astype(x.dtype))
                    else:
                        x = bn(x.astype(jnp.float32)).astype(x.dtype)
            elif char == "d":
                drop = nn.Dropout(rate=self.dropout_prob, deterministic=not train, name=f"dropout{i}")
                if isinstance(x, PackedArray):
                    x = packed_ops.map_data(x, drop)
                else:
                    x = drop(x)
            elif char == "D":
                # channel dropout: drop whole feature maps (torch Dropout2d/3d analog)
                if isinstance(x, PackedArray):
                    if train and self.dropout_prob > 0:
                        x = packed_ops.channel_dropout(x, self.make_rng("dropout"), self.dropout_prob)
                else:
                    x = nn.Dropout(
                        rate=self.dropout_prob,
                        deterministic=not train,
                        broadcast_dims=tuple(range(1, 1 + self.spatial_rank)),
                        name=f"dropout2d{i}",
                    )(x)
            else:
                raise ValueError(
                    f"Unsupported layer type '{char}'. MUST be one of ['b', 'g', 'r', 'l', 'e', 'c', 'd', 'D']"
                )
        return x


class DoubleConv(nn.Module):
    """Two consecutive conv units with the reference channel schedule.

    Encoder path: conv1 goes to out_channels//2 (unless upscale==1), floored
    at in_channels; decoder path: conv1 in->out, conv2 out->out
    (buildingblocks.py:163-227).
    """

    out_channels: int
    encoder: bool
    kernel_size: int | tuple = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int | tuple = 1
    upscale: int = 2
    dropout_prob: float | tuple = 0.1
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if self.encoder:
            conv1_out = self.out_channels if self.upscale == 1 else self.out_channels // 2
            conv1_out = max(conv1_out, in_channels)
        else:
            conv1_out = self.out_channels

        if isinstance(self.dropout_prob, (list, tuple)):
            dropout1, dropout2 = self.dropout_prob
        else:
            dropout1 = dropout2 = self.dropout_prob

        common = dict(
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            padding=self.padding,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
        )
        x = SingleConv(conv1_out, dropout_prob=dropout1, name="SingleConv1", **common)(x, train=train)
        x = SingleConv(self.out_channels, dropout_prob=dropout2, name="SingleConv2", **common)(x, train=train)
        return x


class ResNetBlock(nn.Module):
    """Residual block: 1x1 projection + two conv units + residual add + act.

    Follows the reference scheme (buildingblocks.py:230-288, motivated by
    arXiv:1706.00120): the third conv drops its non-linearity, which is applied
    after the residual sum instead. LeakyReLU slope is 0.1 here, as in the
    reference's standalone non-linearity.
    """

    out_channels: int
    kernel_size: int | tuple = 3
    order: str = "cge"
    num_groups: int = 8
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if in_channels != self.out_channels:
            residual = conv_nd(
                self.out_channels,
                kernel_size=1,
                padding=0,
                use_bias=True,
                dtype=self.dtype,
                kernel_init=conv_kernel_init,
                name="conv1",
                spatial_rank=self.spatial_rank,
            )(x)
        else:
            residual = x

        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")

        common = dict(
            kernel_size=self.kernel_size,
            num_groups=self.num_groups,
            # per-axis 'same' padding: anisotropic kernels (e.g. [1, 3, 3])
            # pad each axis by its own (k-1)//2
            padding=tuple((k - 1) // 2 for k in _to_tuple(self.kernel_size, self.spatial_rank)),
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
        )
        out = SingleConv(self.out_channels, order=self.order, name="conv2", **common)(residual, train=train)
        out = SingleConv(self.out_channels, order=n_order, name="conv3", **common)(out, train=train)
        if isinstance(out, PackedArray):
            out = packed_ops.add(out, residual)
        else:
            out = out + residual
        if "l" in self.order:
            act = lambda v: nn.leaky_relu(v, negative_slope=0.1)  # noqa: E731
        elif "e" in self.order:
            act = nn.elu
        else:
            act = nn.relu
        if isinstance(out, PackedArray):
            return packed_ops.map_data(out, act)
        return act(out)


class ResNetBlockSE(nn.Module):
    """ResNetBlock followed by a squeeze-and-excitation module (buildingblocks.py:291-307)."""

    out_channels: int
    kernel_size: int | tuple = 3
    order: str = "cge"
    num_groups: int = 8
    se_module: str = "scse"
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.se_module in ["scse", "cse", "sse"]
        out = ResNetBlock(
            self.out_channels,
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
            name="block",
        )(x, train=train)
        # SE layers run on the unpacked layout (global-pool + tiny FC; not hot)
        packed = isinstance(out, PackedArray)
        out_u = unpack(out) if packed else out
        if self.se_module == "scse":
            out_u = ChannelSpatialSELayer3D(self.out_channels, reduction_ratio=1, dtype=self.dtype, name="se_module")(out_u)
        elif self.se_module == "cse":
            out_u = ChannelSELayer3D(self.out_channels, reduction_ratio=1, dtype=self.dtype, name="se_module")(out_u)
        else:
            out_u = SpatialSELayer3D(self.out_channels, dtype=self.dtype, name="se_module")(out_u)
        return pack(out_u) if packed else out_u


class _ConvParams(nn.Module):
    """Parameter holder matching Conv3D's scope layout ('kernel', 'bias')."""

    shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kernel_init, self.shape, jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class _AffineParams(nn.Module):
    """Parameter holder matching flax GroupNorm's scope layout ('scale', 'bias')."""

    channels: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.channels,), jnp.float32),
            self.param("bias", nn.initializers.zeros_init(), (self.channels,), jnp.float32),
        )


class _BatchNormState(nn.Module):
    """Parameter/variable holder matching flax BatchNorm's scope layout
    ('scale'/'bias' params, 'mean'/'var' in 'batch_stats') so fused and
    generic decoders share checkpoints."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.channels,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.channels,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.channels,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedUpConcatConv1(nn.Module):
    """SingleConv over concat([skip, nearest_up2x(xs)]) computed fused
    (ops/upconv.py): per-branch norm stats, channel-split conv, phase
    convs on the half-res branch. Parameter scopes are identical to the
    generic SingleConv ('groupnorm'/'batchnorm', 'conv'), so checkpoints are
    interchangeable and torch interop is unaffected.

    Supports rank 3 and rank 2, orders over {g, b, c, r, l, e} whose
    pre-conv part is '', 'g', or 'b' (the flagship 'gcr' and the dsb2018
    2D 'bcr' included); Decoder falls back to the generic path otherwise.
    The BatchNorm fold reproduces flax BatchNorm exactly: fast-variance
    fp32 batch stats in training (per-branch, exact — nearest replication
    preserves per-channel moments), running stats in eval, momentum-0.9
    running updates outside initialization.
    """

    out_channels: int
    order: str = "gcr"
    num_groups: int = 8
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, skip, xs, train: bool = False):
        from pytorch3dunet_tpu.ops.upconv import (
            concat_batch_stats,
            fused_up_concat_conv,
            fused_up_concat_conv_2d,
        )

        in_channels = skip.shape[-1] + xs.shape[-1]
        ci = self.order.index("c")
        pre = self.order[:ci]
        use_bias = not ("g" in self.order or "b" in self.order)

        kernel, conv_bias = _ConvParams(
            (3,) * self.spatial_rank + (in_channels, self.out_channels), use_bias, name="conv"
        )()
        norm_kwargs = {}
        if pre == "g":
            ng = self.num_groups if in_channels >= self.num_groups else 1
            assert in_channels % ng == 0
            scale, bias = _AffineParams(in_channels, name="groupnorm")()
            norm_kwargs = dict(num_groups=ng, gn_scale=scale, gn_bias=bias)
        elif pre == "b":
            scale, bias, ra_mean, ra_var = _BatchNormState(in_channels, name="batchnorm")()
            if train:
                mean_c, var_c = concat_batch_stats(skip, xs)
                if not self.is_initializing():
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean_c
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var_c
            else:
                mean_c, var_c = ra_mean.value, ra_var.value
            a_c = jax.lax.rsqrt(var_c + 1e-5) * scale
            norm_kwargs = dict(affine=(a_c, bias - mean_c * a_c))

        fused = fused_up_concat_conv if self.spatial_rank == 3 else fused_up_concat_conv_2d
        x = fused(skip, xs, kernel, conv_bias=conv_bias, dtype=self.dtype, **norm_kwargs)

        post = self.order[ci + 1 :]
        skip_next = False
        for j, char in enumerate(post):
            if skip_next:
                skip_next = False
                continue
            if char in "rle":
                x = _apply_activation(char, x)
            elif char == "g":
                nxt = post[j + 1] if j + 1 < len(post) else ""
                act = {"r": "relu", "l": "leaky01", "e": "elu"}.get(nxt, "none")
                skip_next = act != "none"
                x = group_norm(x, self.out_channels, self.num_groups, name="groupnorm", act=act)
            elif char == "b":
                bn = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    name="batchnorm",
                )
                x = bn(x.astype(jnp.float32)).astype(x.dtype)
            else:
                raise ValueError(f"unsupported post-conv op '{char}' in fused decoder")
        return x


class FusedDecoderDoubleConv(nn.Module):
    """DoubleConv whose first conv consumes (skip, half-res x) directly via
    FusedUpConcatConv1. Same parameter tree as the generic decoder DoubleConv."""

    out_channels: int
    order: str = "gcr"
    num_groups: int = 8
    dropout_prob: float | tuple = 0.1
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, skip, xs, train: bool = False):
        if isinstance(self.dropout_prob, (list, tuple)):
            _, dropout2 = self.dropout_prob
        else:
            dropout2 = self.dropout_prob
        x = FusedUpConcatConv1(
            self.out_channels,
            order=self.order,
            num_groups=self.num_groups,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
            name="SingleConv1",
        )(skip, xs, train=train)
        x = SingleConv(
            self.out_channels,
            kernel_size=3,
            order=self.order,
            num_groups=self.num_groups,
            padding=1,
            dropout_prob=dropout2,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
            name="SingleConv2",
        )(x, train=train)
        return x


_BASIC_MODULES = {
    "DoubleConv": DoubleConv,
    "ResNetBlock": ResNetBlock,
    "ResNetBlockSE": ResNetBlockSE,
}


def _make_basic_module(basic_module: str, out_channels: int, encoder: bool, *, kernel_size, order, num_groups,
                       padding, upscale, dropout_prob, spatial_rank, dtype, name: str):
    if basic_module == "DoubleConv":
        return DoubleConv(
            out_channels,
            encoder=encoder,
            kernel_size=kernel_size,
            order=order,
            num_groups=num_groups,
            padding=padding,
            upscale=upscale,
            dropout_prob=dropout_prob,
            spatial_rank=spatial_rank,
            dtype=dtype,
            name=name,
        )
    cls = _BASIC_MODULES[basic_module]
    return cls(
        out_channels,
        kernel_size=kernel_size,
        order=order,
        num_groups=num_groups,
        spatial_rank=spatial_rank,
        dtype=dtype,
        name=name,
    )


class Encoder(nn.Module):
    """Optional pooling followed by a basic module (buildingblocks.py:310-384)."""

    out_channels: int
    basic_module: str = "DoubleConv"
    conv_kernel_size: int | tuple = 3
    apply_pooling: bool = True
    pool_kernel_size: int | tuple = 2
    pool_type: str = "max"
    conv_layer_order: str = "gcr"
    num_groups: int = 8
    padding: int | tuple = 1
    upscale: int = 2
    dropout_prob: float | tuple = 0.1
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.pool_type in ["max", "avg"]
        if self.apply_pooling:
            window = _to_tuple(self.pool_kernel_size, self.spatial_rank)
            if isinstance(x, PackedArray):
                x = packed_ops.max_pool(x, window) if self.pool_type == "max" else packed_ops.avg_pool(x, window)
            elif self.pool_type == "max":
                x = max_pool(x, window) if _USE_RESHAPE_POOL else nn.max_pool(
                    x, window_shape=window, strides=window, padding="VALID")
            else:
                x = avg_pool(x, window) if _USE_RESHAPE_POOL else nn.avg_pool(
                    x, window_shape=window, strides=window, padding="VALID")
        x = _make_basic_module(
            self.basic_module,
            self.out_channels,
            encoder=True,
            kernel_size=self.conv_kernel_size,
            order=self.conv_layer_order,
            num_groups=self.num_groups,
            padding=self.padding,
            upscale=self.upscale,
            dropout_prob=self.dropout_prob,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
            name="basic_module",
        )(x, train=train)
        return x


class Decoder(nn.Module):
    """Upsample + join + basic module (buildingblocks.py:387-493).

    `upsample_mode` is already resolved by the model factory: one of
    'nearest'/'linear'/'bilinear'/'trilinear'/'area' (interpolation),
    'deconv' (transposed conv), or None (no upsampling). `concat` selects
    concat-joining (DoubleConv path) vs summation-joining (ResNet path).
    """

    out_channels: int
    basic_module: str = "DoubleConv"
    conv_kernel_size: int | tuple = 3
    scale_factor: int | tuple = 2
    conv_layer_order: str = "gcr"
    num_groups: int = 8
    padding: int | tuple = 1
    upsample_mode: str | None = "nearest"
    concat: bool = True
    dropout_prob: float | tuple = 0.1
    spatial_rank: int = 3
    dtype: jnp.dtype | None = None

    def _fused_path_ok(self, encoder_features, x, packed) -> "str | bool":
        """Returns 'full' / 'mixed' (which fused upsample+concat+conv1 variant
        applies, ops/upconv.py) or False. The fused path covers the flagship
        decoder shapes: nearest 2x (exact per-dim), concat joining,
        DoubleConv with a {''|'g'|'b'}-prefix conv order, rank 3 or rank 2,
        unpacked, no spatial model parallelism, 3^rank kernel with 'same'
        padding."""
        if _os.environ.get("P3DUNET_FUSED_DECODER", "1") != "1":
            return False
        rank = self.spatial_rank
        if packed or rank not in (2, 3):
            return False
        if not (self.concat and self.upsample_mode == "nearest" and self.basic_module == "DoubleConv"):
            return False
        if _to_tuple(self.conv_kernel_size, rank) != (3,) * rank or _to_tuple(self.padding, rank) != (1,) * rank:
            return False
        # the leading axis must be exactly 2x (it phase-folds); irregular
        # trailing axes (nearest-resized on the half-depth tensor, depth-only
        # phase fold) measured slightly SLOWER than the generic path on v5e
        # (23.59 vs 23.93 Mvox/s) and stay opt-in (rank 3 only)
        if encoder_features.shape[1] != 2 * x.shape[1]:
            return False
        hw_exact = encoder_features.shape[2:-1] == tuple(2 * s for s in x.shape[2:-1])
        if not hw_exact and (rank == 2 or _os.environ.get("P3DUNET_FUSED_DECODER_MIXED", "0") != "1"):
            return False
        order = self.conv_layer_order
        if "c" not in order or order[: order.index("c")] not in ("", "g", "b"):
            return False
        if any(ch not in "gbcrle" for ch in order):
            return False
        from pytorch3dunet_tpu.parallel.spatial import active_spatial_axis

        if active_spatial_axis() is not None:
            return False
        return "full" if hw_exact else "mixed"

    @nn.compact
    def __call__(self, encoder_features, x, train: bool = False):
        target_spatial = encoder_features.shape[1:-1]
        packed = isinstance(x, PackedArray)
        fused_mode = self._fused_path_ok(encoder_features, x, packed)
        if fused_mode:
            if fused_mode == "mixed":
                # mixed exactness (e.g. 85 <- 42 pooling floor): bring H/W to
                # target on the HALF-DEPTH tensor; only depth phase-folds
                x = resize_spatial(x, (x.shape[1],) + tuple(encoder_features.shape[2:-1]), mode="nearest")
            return FusedDecoderDoubleConv(
                self.out_channels,
                order=self.conv_layer_order,
                num_groups=self.num_groups,
                dropout_prob=self.dropout_prob,
                spatial_rank=self.spatial_rank,
                dtype=self.dtype,
                name="basic_module",
            )(encoder_features, x, train=train)
        if self.upsample_mode == "deconv":
            # transposed conv with stride=scale_factor then nearest fix-up to the
            # exact encoder size (mirrors TransposeConvUpsampling semantics)
            strides = _to_tuple(self.scale_factor, self.spatial_rank)
            kernel = _to_tuple(self.conv_kernel_size, self.spatial_rank)
            from pytorch3dunet_tpu.parallel.spatial import (
                active_spatial_axis,
                halo_exchange_d,
                spatial_deconv_fixup_indices,
            )

            sp_axis = active_spatial_axis()
            if sp_axis is not None and self.spatial_rank == 3:
                # spatial model parallelism: 2-plane halo, depth-uncropped
                # transposed conv, then a local gather reproducing the global
                # nearest fix-up (parallel/spatial.py)
                assert strides == (2, 2, 2) and kernel == (3, 3, 3), (
                    "spatial sharding supports deconv upsampling with kernel 3 / stride 2"
                )
                xin = unpack(x) if packed else x
                xh = halo_exchange_d(xin, sp_axis, 2)
                # depth padding (k-1, k-1) = the UNCROPPED transposed conv in
                # D (lax.conv_transpose padding pads the dilated input); the
                # fix-up gather below then crops/aligns per shard
                xu = nn.ConvTranspose(
                    self.out_channels,
                    kernel_size=kernel,
                    strides=strides,
                    padding=[(2, 2), (1, 1), (1, 1)],
                    use_bias=False,
                    dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name="upsampling",
                )(xh)
                xu = resize_spatial(xu, (xu.shape[1],) + tuple(target_spatial[1:]), mode="nearest")
                xu = jnp.take(xu, spatial_deconv_fixup_indices(sp_axis, xin.shape[1]), axis=1)
                x = pack(xu) if packed else xu
            elif (
                self.spatial_rank == 3
                and strides == (2, 2, 2)
                and kernel == (3, 3, 3)
                and _os.environ.get("P3DUNET_DECONV", "phase") == "phase"
            ):
                # phase-decomposed transposed conv (ops/upconv.py): the same
                # operator as 8 regular phase convs + one depth-to-space.
                # XLA's conv_transpose lowering (conv over the zero-dilated
                # input) measured catastrophically slow on v5e; this is
                # exact (values AND 2n-1 output size) with the SAME parameter
                # scope ('upsampling'/'kernel'), so checkpoints/torch interop
                # are unaffected. P3DUNET_DECONV=xla restores the lowering.
                from pytorch3dunet_tpu.ops.upconv import phase_conv_transpose

                xin = unpack(x) if packed else x
                w, _ = _ConvParams(
                    (3, 3, 3, xin.shape[-1], self.out_channels), use_bias=False, name="upsampling"
                )()
                if self.dtype is not None:
                    xin = xin.astype(self.dtype)
                    w = w.astype(self.dtype)
                xu = phase_conv_transpose(xin, w)
                xu = resize_spatial(xu, target_spatial, mode="nearest")
                x = pack(xu) if packed else xu
            else:
                xu = nn.ConvTranspose(
                    self.out_channels,
                    kernel_size=kernel,
                    strides=strides,
                    padding=[(1, 1)] * self.spatial_rank,
                    use_bias=False,
                    dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name="upsampling",
                )(unpack(x) if packed else x)
                xu = resize_spatial(xu, target_spatial, mode="nearest")
                x = pack(xu) if packed else xu
        elif self.upsample_mode is not None:
            if packed:
                if self.upsample_mode == "nearest":
                    x = packed_ops.nearest_resize(x, target_spatial)
                else:
                    x = pack(resize_spatial(unpack(x), target_spatial, mode=self.upsample_mode))
            else:
                x = resize_spatial(x, target_spatial, mode=self.upsample_mode)

        if self.concat:
            if packed:
                x = packed_ops.concat_channels(encoder_features, x)
            else:
                x = jnp.concatenate([encoder_features, x], axis=-1)
        elif packed:
            x = packed_ops.add(encoder_features, x)
        else:
            x = encoder_features + x

        x = _make_basic_module(
            self.basic_module,
            self.out_channels,
            encoder=False,
            kernel_size=self.conv_kernel_size,
            order=self.conv_layer_order,
            num_groups=self.num_groups,
            padding=self.padding,
            upscale=2,
            dropout_prob=self.dropout_prob,
            spatial_rank=self.spatial_rank,
            dtype=self.dtype,
            name="basic_module",
        )(x, train=train)
        return x
