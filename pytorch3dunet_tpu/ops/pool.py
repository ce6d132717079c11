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

import jax.numpy as jnp


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


def max_pool(x, window):
    """Max pooling with stride == window (torch floor semantics)."""
    xw = _windowed(x, window)
    axes = tuple(2 + 2 * i for i in range(len(window)))
    return xw.max(axis=axes)


def avg_pool(x, window):
    """Average pooling with stride == window (torch floor semantics)."""
    xw = _windowed(x, window)
    axes = tuple(2 + 2 * i for i in range(len(window)))
    return xw.mean(axis=axes, dtype=jnp.float32).astype(x.dtype)
