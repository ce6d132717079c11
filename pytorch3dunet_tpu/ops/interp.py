"""Spatial resize ops for channels-last tensors.

Replaces torch F.interpolate usage in the reference decoder
(pytorch3dunet/unet3d/buildingblocks.py:598-664) with jax.image.resize, which
uses half-pixel sample positions — the same convention as torch's
align_corners=False default.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

_MODE_TO_METHOD = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "area": "linear",
}


def resize_spatial(x: jax.Array, target_spatial: tuple[int, ...], mode: str = "nearest") -> jax.Array:
    """Resizes the spatial dims of an (N, *spatial, C) tensor to `target_spatial`."""
    if tuple(x.shape[1:-1]) == tuple(target_spatial):
        return x
    if mode == "nearest":
        return _nearest_resize(x, target_spatial)
    method = _MODE_TO_METHOD[mode]
    out_shape = (x.shape[0], *target_spatial, x.shape[-1])
    antialias = mode == "area"
    return jax.image.resize(x, out_shape, method=method, antialias=antialias).astype(x.dtype)


def _upsample2_broadcast(x: jax.Array, axes: set[int]) -> jax.Array:
    """Doubles the given axes; default is sequential jnp.repeat.

    An explicit single broadcast_in_dim measured 2x faster FORWARD in
    isolation (210 vs 101 GB/s, tools/upsampleprobe.py) but its backward is
    slower and it net-loses end-to-end on the train step (20.01 vs 19.78
    Mvox/s, BENCH_NOTES r2) — so it ships opt-in via P3DUNET_UP2X=bc.
    """
    if os.environ.get("P3DUNET_UP2X", "repeat") == "repeat":
        for axis in sorted(axes):
            x = jnp.repeat(x, 2, axis=axis)
        return x
    bshape, bdims = [], []
    for i, s in enumerate(x.shape):
        bdims.append(len(bshape))
        bshape.append(s)
        if i in axes:
            bshape.append(2)
    y = jax.lax.broadcast_in_dim(x, tuple(bshape), tuple(bdims))
    out = tuple(2 * s if i in axes else s for i, s in enumerate(x.shape))
    return y.reshape(out)


def _nearest_resize(x: jax.Array, target_spatial: tuple[int, ...]) -> jax.Array:
    """Nearest-neighbor resize with torch F.interpolate index semantics
    (idx = floor(i * in/out)). Exact 2x axes use a single fused broadcast
    (no gather — much cheaper on TPU than coordinate-based resize)."""
    double_axes = {axis for axis, t in enumerate(target_spatial, start=1) if t == 2 * x.shape[axis]}
    if double_axes:
        x = _upsample2_broadcast(x, double_axes)
    for axis, t in enumerate(target_spatial, start=1):
        s = x.shape[axis]
        if t == s:
            continue
        idx = np.floor(np.arange(t) * s / t).astype(np.int32)
        x = jnp.take(x, jnp.asarray(idx), axis=axis)
    return x


def nearest_upsample_int(x: jax.Array, factors: tuple[int, ...]) -> jax.Array:
    """Fast nearest-neighbor integer upsampling via broadcast (no gather)."""
    double_axes = {axis for axis, f in enumerate(factors, start=1) if f == 2}
    if double_axes:
        x = _upsample2_broadcast(x, double_axes)
    for axis, f in enumerate(factors, start=1):
        if f not in (1, 2):
            x = jnp.repeat(x, f, axis=axis)
    return x
