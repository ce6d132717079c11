"""Lane-packed activation layout: fold W and C into one minor dimension.

TPU VMEM/HBM tiles are (8 sublanes, 128 lanes) with the minor-most array
dimension mapped to lanes. A channels-last activation (N, D, H, W, C) with
C < 128 therefore pads every tile to 128 lanes: at C=32 the physical footprint
and the memory traffic of every elementwise/norm/pool op are 4x the logical
size (8x for fp32 GroupNorm math). This was measured to eat >40% of the UNet3D
train step on v5e (BENCH_NOTES.md).

The fix: carry activations as rank-4 (N, D, H, W*C) [rank-3 (N, H, W*C) in
2D], channel-minor inside the fused axis. Because row-major linear element
order is IDENTICAL to (N, D, H, W, C), every conversion to the shapes XLA's
convolutions want is a pure bitcast-reshape — no data movement beyond what the
conv lowering already does — while GroupNorm, pooling, activations, padding,
residual adds and dropout all run lane-dense.

`PackedArray` is a pytree (channels is static aux data) so it flows through
jit / grad / remat / scan unchanged. Its `.shape` property reports the LOGICAL
channels-last shape so shape-driven model code works on either representation.

Replaces the hot-loop glue around the reference's conv blocks
(pytorch3dunet/unet3d/buildingblocks.py) rather than any reference code path —
the reference (CUDA) has no analogous layout concern.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


def enabled() -> bool:
    """Whether models carry activations lane-packed (P3DUNET_PACKED, default OFF).

    Measured on v5e (BENCH_NOTES.md r2): the packed layout runs the UNet3D
    train step at 11.9 Mvox/s vs 20.1 Mvox/s unpacked. Traces show XLA's own
    layout assignment already avoids the C<128 lane-padding this was designed
    to fix (it places D or W in lanes where profitable, data formatting is
    ~6% of the step), while the explicit packing forces materialized layout
    conversions at every conv boundary. Kept as an opt-in because the op
    suite is correct, tested, and useful for future layout experiments.
    """
    return os.environ.get("P3DUNET_PACKED", "0") == "1"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PackedArray:
    """Channels-last activation with W*C fused into the minor dimension."""

    data: jax.Array  # (N, *leading_spatial, W*C)
    channels: int

    def tree_flatten(self):
        return (self.data,), self.channels

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def width(self) -> int:
        return self.data.shape[-1] // self.channels

    @property
    def shape(self) -> tuple:
        """Logical channels-last shape (N, *spatial, C)."""
        return (*self.data.shape[:-1], self.width, self.channels)

    @property
    def ndim(self) -> int:
        return self.data.ndim + 1

    def astype(self, dtype):
        return PackedArray(self.data.astype(dtype), self.channels)


def pack(x: jax.Array) -> PackedArray:
    """(N, *spatial, C) -> PackedArray; a bitcast reshape."""
    if isinstance(x, PackedArray):
        return x
    c = x.shape[-1]
    return PackedArray(x.reshape(*x.shape[:-2], x.shape[-2] * c), c)


def unpack(p) -> jax.Array:
    """PackedArray -> (N, *spatial, C); a bitcast reshape."""
    if not isinstance(p, PackedArray):
        return p
    return p.data.reshape(p.shape)


def map_data(p: PackedArray, fn) -> PackedArray:
    """Applies an elementwise function to the packed buffer."""
    return PackedArray(fn(p.data), p.channels)


def add(a: PackedArray, b: PackedArray) -> PackedArray:
    assert a.channels == b.channels, (a.channels, b.channels)
    return PackedArray(a.data + b.data, a.channels)


def concat_channels(a: PackedArray, b: PackedArray) -> PackedArray:
    """Channel concatenation: interleaves per-pixel channel blocks."""
    lead = a.data.shape[:-1]
    assert b.data.shape[:-1] == lead and a.width == b.width
    w = a.width
    da = a.data.reshape(*lead, w, a.channels)
    db = b.data.reshape(*lead, w, b.channels)
    out = jnp.concatenate([da, db], axis=-1)
    c = a.channels + b.channels
    return PackedArray(out.reshape(*lead, w * c), c)


def group_norm_act_dense(x, scale, bias, num_groups: int, eps: float, act: str = "none",
                         axis_name: str | None = None):
    """GroupNorm on a plain channels-last tensor with NO big-tensor reshape.

    flax GroupNorm reshapes the volume to (N, -1, G, C/G) for its statistics;
    on TPU that reshape materializes layout copies and its backward
    materializes full-volume broadcasts (measured while building the packed
    variant below). Here the statistics come from plain axis reductions
    (big tensor -> (N, C) in one lane-dense pass) and the affine applies with
    per-channel vectors. Numerics: fp32 stats, fast variance, eps inside the
    sqrt — torch GroupNorm parity, same as flax.
    """
    c, g = x.shape[-1], num_groups
    n = x.shape[0]
    spatial_axes = tuple(range(1, x.ndim - 1))
    count = np.prod([x.shape[a] for a in spatial_axes], dtype=np.float64) * (c // g)

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=spatial_axes).reshape(n, g, c // g).sum(axis=2)  # (n, g)
    s2 = jnp.sum(jnp.square(xf), axis=spatial_axes).reshape(n, g, c // g).sum(axis=2)
    if axis_name is not None:
        # spatial model parallelism: statistics are GLOBAL over the sharded
        # volume so normalization matches the unsharded model exactly
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        count = count * jax.lax.axis_size(axis_name)
    mean = s1 / count
    var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
    mul = jax.lax.rsqrt(var + eps)  # (n, g)

    s = mul[:, :, None] * scale.astype(jnp.float32).reshape(g, c // g)
    b = bias.astype(jnp.float32).reshape(g, c // g) - mean[:, :, None] * s
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    if x.dtype == jnp.float32:
        y = xf * s.reshape(bshape) + b.reshape(bshape)
    else:
        # apply in the compute dtype, reading the ORIGINAL tensor: if the
        # apply consumed `xf` too, XLA materializes the fp32 convert (shared
        # by stats + apply) as a full-volume fp32 tensor — 3x the HBM traffic
        # of the op itself (measured, v5e). One extra bf16 rounding on the
        # per-channel affine is the cost.
        y = x * s.reshape(bshape).astype(x.dtype) + b.reshape(bshape).astype(x.dtype)
    if act != "none":
        y = {"relu": jax.nn.relu, "elu": jax.nn.elu, "leaky01": lambda v: jax.nn.leaky_relu(v, 0.01)}[act](y)
    return y


def group_norm_act(p: PackedArray, scale, bias, num_groups: int, eps: float, act: str = "none") -> PackedArray:
    """GroupNorm over a packed activation, fp32 statistics, optional fused act.

    Same numerics as flax.linen.GroupNorm(dtype=f32) + activation (fast
    variance E[x^2]-E[x]^2, biased, eps inside the sqrt — torch parity), but
    every read/write is lane-dense: no 128/C tile padding.
    """
    data = p.data
    c, g = p.channels, num_groups
    w = p.width
    n = data.shape[0]
    bshape = (n,) + (1,) * (data.ndim - 2) + (data.shape[-1],)

    # statistics WITHOUT reshaping the big tensor: reduce the leading spatial
    # axes lane-dense first (big -> (N, W*C)), then fold the tiny vector into
    # groups. A reshape of the full volume materializes layout copies (and its
    # backward materializes full-volume broadcasts) — measured 4x step cost.
    spatial_axes = tuple(range(1, data.ndim - 1))
    count = np.prod([data.shape[a] for a in spatial_axes], dtype=np.float64) * w * (c // g)
    xf = data.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=spatial_axes).reshape(n, w, g, c // g).sum(axis=(1, 3))  # (n, g)
    s2 = jnp.sum(jnp.square(xf), axis=spatial_axes).reshape(n, w, g, c // g).sum(axis=(1, 3))
    mean = s1 / count
    var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
    mul = jax.lax.rsqrt(var + eps)  # (n, g)

    s = mul[:, :, None] * scale.astype(jnp.float32).reshape(g, c // g)
    b = bias.astype(jnp.float32).reshape(g, c // g) - mean[:, :, None] * s
    s = jnp.tile(s.reshape(n, c), (1, w)).reshape(bshape)
    b = jnp.tile(b.reshape(n, c), (1, w)).reshape(bshape)

    y = (xf * s + b).astype(data.dtype)
    if act != "none":
        y = {"relu": jax.nn.relu, "elu": jax.nn.elu, "leaky01": lambda v: jax.nn.leaky_relu(v, 0.01)}[act](y)
    return PackedArray(y, c)


def _pool(p: PackedArray, window, reduce_major, reduce_packed) -> PackedArray:
    """Shared stride==kernel pooling core (torch floor semantics: remainder
    rows are cropped). Each axis reduces via a bitcast reshape-split."""
    data, c = p.data, p.channels
    kw = window[-1]
    wq = p.width // kw
    data = data[..., : wq * kw * c]
    for axis, k in enumerate(window[:-1], start=1):
        if k == 1:
            continue
        sq = data.shape[axis] // k
        data = jax.lax.slice_in_dim(data, 0, sq * k, axis=axis)
        shape = data.shape[:axis] + (sq, k) + data.shape[axis + 1 :]
        data = reduce_major(data.reshape(shape), axis + 1)
    if kw != 1:
        lead = data.shape[:-1]
        data = reduce_packed(data.reshape(*lead, wq, kw, c))
        data = data.reshape(*lead, wq * c)
    return PackedArray(data, c)


def max_pool(p: PackedArray, window) -> PackedArray:
    return _pool(p, window, lambda x, a: x.max(axis=a), lambda x: x.max(axis=-2))


def avg_pool(p: PackedArray, window) -> PackedArray:
    dt = p.dtype
    out = _pool(
        p,
        window,
        lambda x, a: x.mean(axis=a, dtype=jnp.float32),
        lambda x: x.mean(axis=-2, dtype=jnp.float32),
    )
    return out.astype(dt)


def nearest_upsample_int(p: PackedArray, factors) -> PackedArray:
    """Nearest-neighbor upsampling by integer factors (broadcast, no gather)."""
    data, c = p.data, p.channels
    for axis, f in enumerate(factors[:-1], start=1):
        if f != 1:
            data = jnp.repeat(data, f, axis=axis)
    fw = factors[-1]
    if fw != 1:
        lead = data.shape[:-1]
        w = data.shape[-1] // c
        data = data.reshape(*lead, w, 1, c)
        data = jnp.broadcast_to(data, (*lead, w, fw, c)).reshape(*lead, w * fw * c)
    return PackedArray(data, c)


def nearest_resize(p: PackedArray, target_spatial) -> PackedArray:
    """Nearest resize with torch F.interpolate index semantics
    (idx = floor(i * in/out)); exact-2x axes use the broadcast fast path."""
    data, c = p.data, p.channels
    spatial = p.shape[1:-1]
    assert len(target_spatial) == len(spatial)
    for axis, (s, t) in enumerate(zip(spatial[:-1], target_spatial[:-1]), start=1):
        if t == s:
            continue
        if t == 2 * s:
            data = jnp.repeat(data, 2, axis=axis)
        else:
            idx = np.floor(np.arange(t) * s / t).astype(np.int32)
            data = jnp.take(data, jnp.asarray(idx), axis=axis)
    w, tw = spatial[-1], target_spatial[-1]
    if tw == 2 * w:
        lead = data.shape[:-1]
        data = data.reshape(*lead, w, 1, c)
        data = jnp.broadcast_to(data, (*lead, w, 2, c)).reshape(*lead, 2 * w * c)
    elif tw != w:
        idx_w = np.floor(np.arange(tw) * w / tw).astype(np.int32)
        idx = (idx_w[:, None] * c + np.arange(c)[None, :]).reshape(-1)
        data = jnp.take(data, jnp.asarray(idx), axis=-1)
    return PackedArray(data, c)


def channel_dropout(p: PackedArray, rng, rate: float) -> PackedArray:
    """Drops whole channels (torch Dropout2d/3d analog) on a packed activation."""
    n, c, w = p.data.shape[0], p.channels, p.width
    keep = jax.random.bernoulli(rng, 1.0 - rate, (n, c))
    mask = (keep / (1.0 - rate)).astype(p.dtype)
    bshape = (n,) + (1,) * (p.data.ndim - 2) + (w * c,)
    mask = jnp.tile(mask, (1, w)).reshape(bshape)
    return PackedArray(p.data * mask, p.channels)
