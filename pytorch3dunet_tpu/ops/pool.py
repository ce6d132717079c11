"""TPU-tuned pooling for stride==kernel windows.

XLA lowers max-pool gradients to `select-and-scatter`, which measured at
~8.7 ms/step in the UNet3D train step (tools trace, v5e) — more than any
convolution. For the non-overlapping windows a U-Net uses (stride == kernel),
pooling is a reshape + max/mean reduction, whose autodiff gradient is a cheap
elementwise equality-mask broadcast instead of a scatter.

torch parity: output size floor((S - k)/k + 1) — trailing remainder rows are
cropped and receive zero gradient, exactly like torch MaxPool/AvgPool.

Tie-breaking note: where several window elements equal the max, the gradient
here splits between them (torch/XLA route it to one element). Both are valid
subgradients; ties are measure-zero for continuous activations.
"""

import os

import jax
import jax.numpy as jnp

# "axes" (default): one windowed reshape+reduce per spatial axis, minor axis
#   first. The all-axes-at-once "reshape" form's backward materializes a
#   (d,2,h,2,w,2,C)-shaped broadcast that tiles terribly on TPU for C < 128
#   (~9.5 ms/step in the UNet3D train step); per-axis reduction lowers to
#   clean 2-element-minor broadcasts (measured +9% train throughput, v5e).
# "reshape": single windowed reshape + max/mean over all axes.
# "slice2": per-axis pairwise max/mean over stride-2 slices (measured slower).
_POOL_MODE = os.environ.get("P3DUNET_POOL", "axes")


def _crop_to_multiple(x, window):
    slices = [slice(None)]
    for axis, k in enumerate(window, start=1):
        size = (x.shape[axis] // k) * k
        slices.append(slice(0, size))
    slices.append(slice(None))
    return x[tuple(slices)]


def _windowed(x, window):
    """(N, *spatial, C) -> (N, s1/k1, k1, s2/k2, k2, ..., C) view."""
    x = _crop_to_multiple(x, window)
    shape = [x.shape[0]]
    for axis, k in enumerate(window, start=1):
        shape.extend([x.shape[axis] // k, k])
    shape.append(x.shape[-1])
    return x.reshape(shape)


def _pair_reduce(x, window, op):
    """Sequential per-axis pairwise reduce over stride-2 slices (k==2 axes)."""
    for axis in reversed(range(1, 1 + len(window))):
        k = window[axis - 1]
        if k == 1:
            continue
        n = (x.shape[axis] // 2) * 2
        a = jax.lax.slice_in_dim(x, 0, n, 2, axis)
        b = jax.lax.slice_in_dim(x, 1, n, 2, axis)
        x = op(a, b)
    return x


def _axis_reduce(x, window, op):
    """Per-axis windowed reshape+reduce, minor spatial axis first."""
    for axis in reversed(range(1, 1 + len(window))):
        k = window[axis - 1]
        if k == 1:
            continue
        n = (x.shape[axis] // k) * k
        x = jax.lax.slice_in_dim(x, 0, n, 1, axis)
        shape = x.shape[:axis] + (n // k, k) + x.shape[axis + 1 :]
        x = op(x.reshape(shape), axis + 1)
    return x


def max_pool(x, window):
    """Max pooling with stride == window (torch floor semantics)."""
    if _POOL_MODE == "axes":
        return _axis_reduce(x, window, lambda v, ax: v.max(axis=ax))
    if _POOL_MODE == "slice2" and all(k in (1, 2) for k in window):
        return _pair_reduce(x, window, jnp.maximum)
    xw = _windowed(x, window)
    axes = tuple(2 + 2 * i for i in range(len(window)))
    return xw.max(axis=axes)


def avg_pool(x, window):
    """Average pooling with stride == window (torch floor semantics)."""
    if _POOL_MODE == "axes":
        scale = 1.0 / float(jnp.prod(jnp.asarray(window)))
        out = _axis_reduce(x.astype(jnp.float32), window, lambda v, ax: v.sum(axis=ax))
        return (out * scale).astype(x.dtype)
    if _POOL_MODE == "slice2" and all(k in (1, 2) for k in window):
        scale = 1.0 / (2 ** sum(1 for k in window if k == 2))
        out = _pair_reduce(x.astype(jnp.float32), window, lambda a, b: a + b)
        return (out * scale).astype(x.dtype)
    xw = _windowed(x, window)
    axes = tuple(2 + 2 * i for i in range(len(window)))
    return xw.mean(axis=axes, dtype=jnp.float32).astype(x.dtype)
