"""On-device augmentation ops (jit-able, channels-last).

Device fast-path counterparts of the numpy transforms in
augment/transforms.py: the host pipeline defines the semantics (and remains
the default); these run the cheap geometric/intensity transforms on TPU so the
host loader only streams raw patches. A single PRNG key drives both the raw
and label variants of each geometric transform, reproducing the paired-RNG
consistency contract of the host pipeline (transforms.py:905-934).

All ops take a single sample (D, H, W, C) channels-last; batch with jax.vmap.
Elastic deformation uses order-1 (trilinear) resampling for raw — the device
analog of scipy's order-3 spline — and order-0 for labels (exact parity).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def random_flip(key, x, axis_prob: float = 0.5):
    """Flips each spatial axis independently with probability 1 - axis_prob
    (matching RandomFlip, transforms.py:46-57). Same key => same flips."""
    draws = jax.random.uniform(key, (3,))
    for axis in range(3):
        flipped = jnp.flip(x, axis)
        x = jnp.where(draws[axis] > axis_prob, flipped, x)
    return x


def random_rotate90(key, x):
    """Rotates by a random multiple of 90 degrees in the HW plane (requires
    H == W under jit). Matches RandomRotate90 (z-axis preserved)."""
    assert x.shape[1] == x.shape[2], "device rot90 requires square HW patches"
    k = jax.random.randint(key, (), 0, 4)
    return jax.lax.switch(
        k,
        [
            lambda v: v,
            lambda v: jnp.rot90(v, 1, axes=(1, 2)),
            lambda v: jnp.rot90(v, 2, axes=(1, 2)),
            lambda v: jnp.rot90(v, 3, axes=(1, 2)),
        ],
        x,
    )


def random_contrast(key, x, alpha=(0.5, 1.5), mean: float = 0.0, execution_probability: float = 0.1):
    kp, ka = jax.random.split(key)
    a = jax.random.uniform(ka, (), minval=alpha[0], maxval=alpha[1])
    adjusted = jnp.clip(mean + a * (x - mean), -1, 1)
    return jnp.where(jax.random.uniform(kp) < execution_probability, adjusted, x)


def additive_gaussian_noise(key, x, scale=(0.0, 1.0), execution_probability: float = 0.1):
    kp, ks, kn = jax.random.split(key, 3)
    std = jax.random.uniform(ks, (), minval=scale[0], maxval=scale[1])
    noisy = x + std * jax.random.normal(kn, x.shape, dtype=x.dtype)
    return jnp.where(jax.random.uniform(kp) < execution_probability, noisy, x)


def additive_poisson_noise(key, x, lam=(0.0, 1.0), execution_probability: float = 0.1):
    kp, kl, kn = jax.random.split(key, 3)
    rate = jax.random.uniform(kl, (), minval=lam[0], maxval=lam[1])
    noise = jax.random.poisson(kn, rate, x.shape).astype(x.dtype)
    return jnp.where(jax.random.uniform(kp) < execution_probability, x + noise, x)


def _separable_gaussian_1d(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / jnp.sum(w)


def gaussian_blur(key, x, sigma=(0.1, 2.0), execution_probability: float = 0.5, radius: int = 8):
    """Random-sigma separable Gaussian blur (GaussianBlur3D analog). The
    truncation radius is static (jit); sigma is sampled on device."""
    kp, ks = jax.random.split(key)
    s = jax.random.uniform(ks, (), minval=sigma[0], maxval=sigma[1])
    w = _separable_gaussian_1d(s, radius)

    # channels become the conv batch: (D, H, W, C) -> (C, D, H, W, 1)
    blurred = jnp.moveaxis(x.astype(jnp.float32), -1, 0)[..., None]
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = 2 * radius + 1
        kernel = w.reshape(shape)[..., None, None]  # (*spatial, 1, 1)
        # edge-replicate padding preserves intensity at the borders
        pad_width = [(0, 0)] + [(radius, radius) if a == axis else (0, 0) for a in range(3)] + [(0, 0)]
        blurred = jax.lax.conv_general_dilated(
            jnp.pad(blurred, pad_width, mode="edge"), kernel, (1, 1, 1),
            [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    blurred = jnp.moveaxis(blurred[..., 0], 0, -1).astype(x.dtype)
    return jnp.where(jax.random.uniform(kp) < execution_probability, blurred, x)


def elastic_deformation(key, x, spline_order: int, alpha: float = 2000.0, sigma: float = 50.0,
                        execution_probability: float = 0.1, apply_3d: bool = True, grid_downsample: int = 8):
    """Elastic deformation with Gaussian-smoothed displacement fields.

    Device analog of ElasticDeformation (transforms.py:206-269): the random
    field is sampled on a `grid_downsample`-coarser grid, smoothed, and
    upsampled — equivalent smoothness at sigma/grid_downsample, far cheaper
    than a 401-tap blur. Same key => identical displacement for raw and label.
    """
    assert spline_order in (0, 1), "device elastic deformation supports order 0 (nearest) and 1 (trilinear)"
    kp, kz, ky, kx = jax.random.split(key, 4)
    spatial = x.shape[:3]

    coarse = tuple(max(2, s // grid_downsample) for s in spatial)
    sig = sigma / grid_downsample
    radius = max(2, int(2 * sig))
    w = _separable_gaussian_1d(sig, radius)

    def smooth_field(k):
        f = jax.random.normal(k, coarse, dtype=jnp.float32)[None, ..., None]
        for axis in range(3):
            shape = [1, 1, 1]
            shape[axis] = 2 * radius + 1
            kernel = w.reshape(shape)[..., None, None]
            f = jax.lax.conv_general_dilated(
                f, kernel, (1, 1, 1),
                [(radius, radius) if a == axis else (0, 0) for a in range(3)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        f = jax.image.resize(f[0, ..., 0], spatial, method="linear")
        return f * alpha

    dz = smooth_field(kz) if apply_3d else jnp.zeros(spatial, dtype=jnp.float32)
    dy = smooth_field(ky)
    dx = smooth_field(kx)

    zz, yy, xx = jnp.meshgrid(
        jnp.arange(spatial[0], dtype=jnp.float32),
        jnp.arange(spatial[1], dtype=jnp.float32),
        jnp.arange(spatial[2], dtype=jnp.float32),
        indexing="ij",
    )
    coords = [zz + dz, yy + dy, xx + dx]

    def deform_channel(ch):
        return map_coordinates(ch, coords, order=spline_order, mode="reflect")

    deformed = jax.vmap(deform_channel, in_axes=-1, out_axes=-1)(x.astype(jnp.float32))
    deformed = deformed.astype(x.dtype)
    return jnp.where(jax.random.uniform(kp) < execution_probability, deformed, x)


def paired_geometric(key, raw, label, axis_prob: float = 0.5, rot90: bool = True):
    """Applies the shared-geometry transforms (flip + rot90) to a raw/label
    pair with one key — the device analog of the Transformer seed pairing."""
    kf, kr = jax.random.split(key)
    raw = random_flip(kf, raw, axis_prob)
    label = random_flip(kf, label, axis_prob)
    if rot90:
        raw = random_rotate90(kr, raw)
        label = random_rotate90(kr, label)
    return raw, label
