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
import numpy as np
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


def _bspline3_inverse_matrix(n: int) -> jnp.ndarray:
    """Inverse of the cubic-B-spline interpolation matrix for an n-sample
    signal with scipy's 'reflect' boundary (x[-1] = x[0]).

    Interpolation at node i reads (c[i-1] + 4 c[i] + c[i+1]) / 6 with the
    coefficients inheriting the reflect symmetry (c[-1] = c[0]); solving the
    tridiagonal system exactly as one dense (n, n) matmul is both exact and
    MXU-friendly (patch sides are a few hundred samples at most).
    """
    import numpy as _np

    m = _np.zeros((n, n), dtype=_np.float64)
    for i in range(n):
        m[i, i] = 4.0 / 6.0
        for j in (i - 1, i + 1):
            r = j if 0 <= j < n else (0 if j < 0 else n - 1)  # reflect
            m[i, r] += 1.0 / 6.0
    return jnp.asarray(_np.linalg.inv(m), dtype=jnp.float32)


def _bspline3_prefilter(data):
    """Per-axis exact cubic-B-spline prefilter of a (D, H, W) volume."""
    for axis in range(3):
        inv = _bspline3_inverse_matrix(data.shape[axis])
        data = jnp.moveaxis(jnp.tensordot(inv, jnp.moveaxis(data, axis, 0), axes=1), 0, axis)
    return data


def _reflect_index(i, n: int):
    """scipy 'reflect' index extension: (d c b a | a b c d | d c b a)."""
    i = jnp.mod(i, 2 * n)
    return jnp.where(i >= n, 2 * n - 1 - i, i)


def map_coordinates_cubic(data, coords):
    """Cubic (order-3) B-spline `map_coordinates` with 'reflect' boundary for
    a 3-D volume — the device counterpart of the host elastic deformation's
    raw resampling (scipy map_coordinates(order=3, mode='reflect'),
    reference transforms.py:264-266). jax.scipy's map_coordinates stops at
    order 1; this computes the exact spline coefficients (see
    `_bspline3_prefilter`) and evaluates the 64-tap separable kernel."""
    c = _bspline3_prefilter(data.astype(jnp.float32))
    shape = data.shape

    base = [jnp.floor(g) for g in coords]
    frac = [g - b for g, b in zip(coords, base)]

    def weights(t):
        t2, t3 = t * t, t * t * t
        return (
            (1 - 3 * t + 3 * t2 - t3) / 6.0,  # tap at floor - 1
            (4 - 6 * t2 + 3 * t3) / 6.0,      # floor
            (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0,  # floor + 1
            t3 / 6.0,                          # floor + 2
        )

    w = [weights(f) for f in frac]
    idx = [
        [_reflect_index(b.astype(jnp.int32) + o - 1, n) for o in range(4)]
        for b, n in zip(base, shape)
    ]

    flat = c.reshape(-1)
    sy = shape[2]
    sz = shape[1] * shape[2]
    out = jnp.zeros(coords[0].shape, dtype=jnp.float32)
    for a in range(4):
        za = idx[0][a] * sz
        wa = w[0][a]
        for b in range(4):
            yb = za + idx[1][b] * sy
            wab = wa * w[1][b]
            for d in range(4):
                out = out + wab * w[2][d] * jnp.take(flat, yb + idx[2][d])
    return out


def elastic_deformation(key, x, spline_order: int, alpha: float = 2000.0, sigma: float = 50.0,
                        execution_probability: float = 0.1, apply_3d: bool = True, grid_downsample: int = 8):
    """Elastic deformation with Gaussian-smoothed displacement fields.

    Device analog of ElasticDeformation (transforms.py:206-269): the random
    field is sampled on a `grid_downsample`-coarser grid, smoothed, and
    upsampled — equivalent smoothness at sigma/grid_downsample, far cheaper
    than a 401-tap blur. Same key => identical displacement for raw and label.

    Amplitude calibration: smoothing unit white noise with a sum-1 Gaussian
    kernel yields std (2*sqrt(pi)*sigma)^(-3/2), so the coarse-grid field
    (sigma/gd) is gd^1.5 STRONGER than the host's full-res field for the same
    alpha; the displacement is scaled by gd^-1.5 to match the host
    distribution.

    spline_order 3 resamples through `map_coordinates_cubic` — faithful to
    the host's scipy order-3 raw resampling; 0/1 use jax map_coordinates.
    """
    assert spline_order in (0, 1, 3), "device elastic deformation supports spline orders 0, 1 and 3"
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
        return f * (alpha * grid_downsample**-1.5)

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
        if spline_order == 3:
            return map_coordinates_cubic(ch, coords)
        return map_coordinates(ch, coords, order=spline_order, mode="reflect")

    deformed = jax.vmap(deform_channel, in_axes=-1, out_axes=-1)(x.astype(jnp.float32))
    deformed = deformed.astype(x.dtype)
    return jnp.where(jax.random.uniform(kp) < execution_probability, deformed, x)


def random_rotate(key, x, axes=((2, 1),), angle_spectrum: float = 30.0, spline_order: int = 1):
    """Arbitrary-angle rotation in a randomly chosen spatial plane — device
    analog of RandomRotate (transforms.py:93-139, scipy.ndimage.rotate with
    reshape=False). Orders 0 (nearest, the host default), 1 (trilinear) and
    3 (cubic B-spline via map_coordinates_cubic); reflect boundary. Same
    key => identical plane/angle for raw and label."""
    assert spline_order in (0, 1, 3)
    ka, kx = jax.random.split(key)
    angle = jax.random.uniform(kx, (), minval=-angle_spectrum, maxval=angle_spectrum) * jnp.pi / 180.0
    spatial = x.shape[:3]
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial], indexing="ij")

    def rotate_in(plane):
        a0, a1 = plane
        c0 = (spatial[a0] - 1) / 2.0
        c1 = (spatial[a1] - 1) / 2.0
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        g0, g1 = grids[a0] - c0, grids[a1] - c1
        coords = list(grids)
        coords[a0] = cos * g0 - sin * g1 + c0  # inverse-rotation sampling
        coords[a1] = sin * g0 + cos * g1 + c1

        def ch(c):
            if spline_order == 3:
                return map_coordinates_cubic(c, coords)
            return map_coordinates(c, coords, order=spline_order, mode="reflect")

        return jax.vmap(ch, in_axes=-1, out_axes=-1)(x.astype(jnp.float32))

    idx = jax.random.randint(ka, (), 0, len(axes))
    rotated = jax.lax.switch(idx, [partial(rotate_in, tuple(p)) for p in axes])
    return rotated.astype(x.dtype)


def thick_boundary(label, connectivity: int = 2):
    """skimage/ndimage `find_boundaries(mode='thick')` on device: a voxel is
    boundary when the max and min label over its footprint differ. The
    footprint takes offsets in {-1,0,1}^3 with 1..connectivity nonzero
    coordinates; edge replication matches the host's mode='nearest' filters
    (utils/ndimage.py find_boundaries)."""
    # compare in the input dtype: a float32 downcast would merge integer
    # instance ids >= 2^24 and silently drop their shared boundary
    padded = jnp.pad(label, 1, mode="edge")
    d, h, w = label.shape
    mx = label
    mn = label
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                order = (dz != 0) + (dy != 0) + (dx != 0)
                if order == 0 or order > connectivity:
                    continue
                sl = padded[1 + dz : 1 + dz + d, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                mx = jnp.maximum(mx, sl)
                mn = jnp.minimum(mn, sl)
    return mx != mn


def _recover_ignore(result, label, ignore_index):
    if ignore_index is None:
        return result
    return jnp.where(label == ignore_index, jnp.float32(ignore_index), result)


def standard_label_to_boundary(label, ignore_index=None, append_label=False, foreground=False):
    """Device StandardLabelToBoundary (reference transforms.py:338-379, mode
    'thick', connectivity 2): (D, H, W) label -> channels-LAST (D, H, W, C)."""
    b = _recover_ignore(thick_boundary(label).astype(jnp.float32), label, ignore_index)
    channels = []
    if foreground:
        channels.append(_recover_ignore((label > 0).astype(jnp.float32), label, ignore_index))
    channels.append(b)
    if append_label:
        channels.append(label.astype(jnp.float32))
    return jnp.stack(channels, axis=-1)


def blobs_to_mask(label, append_label=False):
    """Device BlobsToMask without the boundary option (reference
    transforms.py:382-417): foreground mask (+ original label) channels."""
    channels = [(label > 0).astype(jnp.float32)]
    if append_label:
        channels.append(label.astype(jnp.float32))
    return jnp.stack(channels, axis=-1)


def _axis_affinity(label, volume_axis: int, offset):
    """One affinity channel: 1 where the label changes across `offset` voxels
    along `volume_axis`. The host computes this as |convolve(m, k)| > 0 with a
    +1/-1 offset kernel (reference transforms.py:452-455,476-485); scipy's
    centered convolve reads taps m[i + ceil(o/2)] and m[i - floor(o/2)] with
    'reflect' boundary, which is what the gather below compares directly.
    `offset` may be a traced scalar (RandomLabelToAffinities)."""
    n = label.shape[volume_axis]
    i = jnp.arange(n)
    hi = _reflect_index(i + (offset + 1) // 2, n)
    lo = _reflect_index(i - offset // 2, n)
    taps_hi = jnp.take(label, hi, axis=volume_axis)
    taps_lo = jnp.take(label, lo, axis=volume_axis)
    return (taps_hi != taps_lo).astype(jnp.float32)


# reference kernel emission order is X, Y, Z (AXES_TRANSPOSE,
# transforms.py:430-436) = channels-last volume axes 2, 1, 0
_AFFINITY_VOLUME_AXES = (2, 1, 0)


def label_to_affinities(label, offsets, z_offsets=None, aggregate_affinities=False,
                        append_label=False, ignore_index=None):
    """Device LabelToAffinities (reference transforms.py:524-566): one channel
    per (offset, axis) pair in X, Y, Z kernel order; optional OR-aggregation
    across the three axes of each offset. (D, H, W) -> channels-last."""
    z_offsets = list(offsets) if z_offsets is None else list(z_offsets)
    assert len(z_offsets) == len(offsets)
    channels = []
    for xy, z in zip(offsets, z_offsets):
        triple = [
            _axis_affinity(label, axis, z if axis == 0 else xy)
            for axis in _AFFINITY_VOLUME_AXES
        ]
        if aggregate_affinities:
            agg = jnp.maximum(jnp.maximum(triple[0], triple[1]), triple[2])
            channels.append(_recover_ignore(agg, label, ignore_index))
        else:
            channels.extend(_recover_ignore(c, label, ignore_index) for c in triple)
    if append_label:
        channels.append(label.astype(jnp.float32))
    return jnp.stack(channels, axis=-1)


def label_to_z_affinities(label, offsets, append_label=False, ignore_index=None):
    """Device LabelToZAffinities (reference transforms.py:569-595): affinity
    channels along the z axis only."""
    channels = [_recover_ignore(_axis_affinity(label, 0, o), label, ignore_index) for o in offsets]
    if append_label:
        channels.append(label.astype(jnp.float32))
    return jnp.stack(channels, axis=-1)


def random_label_to_affinities(key, label, max_offset: int = 10, z_offset_scale: int = 2,
                               append_label=False, ignore_index=None):
    """Device RandomLabelToAffinities (reference transforms.py:490-521): one
    affinity channel at a random offset along a random axis per call (z offsets
    scaled down for anisotropy). Draws come from the device PRNG instead of the
    transformer's RandomState — same distribution, different stream."""
    ko, ka = jax.random.split(key)
    offset = jax.random.randint(ko, (), 1, max_offset + 1)
    axis_ind = jax.random.randint(ka, (), 0, 3)  # reference order: X, Y, Z
    offset = jnp.where(axis_ind == 2, jnp.maximum(1, offset // z_offset_scale), offset)
    aff = jax.lax.switch(axis_ind, [
        partial(_axis_affinity, label, axis) for axis in _AFFINITY_VOLUME_AXES
    ], offset)
    channels = [_recover_ignore(aff, label, ignore_index)]
    if append_label:
        channels.append(label.astype(jnp.float32))
    return jnp.stack(channels, axis=-1)


def label_to_boundary_and_affinities(label, xy_offsets, z_offsets, append_label=False,
                                     ignore_index=None, foreground=False):
    """Device LabelToBoundaryAndAffinities, mode='thick' (reference
    transforms.py:598-631): thick-boundary channel(s) followed by the affinity
    channels; append_label applies to the affinity block, as on host."""
    b = standard_label_to_boundary(label, ignore_index=ignore_index, foreground=foreground)
    a = label_to_affinities(label, xy_offsets, z_offsets, append_label=append_label,
                            ignore_index=ignore_index)
    return jnp.concatenate([b, a], axis=-1)


def label_to_mask_and_affinities(label, xy_offsets, z_offsets, append_label=False,
                                 background=0, ignore_index=None):
    """Device LabelToMaskAndAffinities (reference transforms.py:634-650):
    foreground-mask channel followed by the affinity channels."""
    mask = (label > background).astype(jnp.float32)[..., None]
    a = label_to_affinities(label, xy_offsets, z_offsets, append_label=append_label,
                            ignore_index=ignore_index)
    return jnp.concatenate([mask, a], axis=-1)


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


# ---------------------------------------------------------------------------
# config-driven device augmentation (loaders.device_augment: true)
# ---------------------------------------------------------------------------

# transforms that can move from the host pipeline onto the device
DEVICE_MOVABLE = {
    "RandomFlip", "RandomRotate90", "RandomRotate", "ElasticDeformation",
    "AdditiveGaussianNoise", "AdditivePoissonNoise", "GaussianBlur3D", "RandomContrast",
}
_PAIRED = {"RandomFlip", "RandomRotate90", "RandomRotate", "ElasticDeformation"}
# geometric transforms that do NOT commute with label engineering: when the
# engineering stays on host, these must not be reordered after it (the device
# runs its transforms last) — boundary-of-deformed != deformed-boundary
_ORDER_SENSITIVE = {"RandomRotate", "ElasticDeformation"}


def _rotate_axes(cfg) -> tuple:
    axes = cfg.get("axes") or [(1, 0), (2, 1), (2, 0)]
    return tuple(tuple(a) for a in axes)


def _label_post_movable(cfg: dict) -> bool:
    """True when a label-engineering transform has an exact device kernel."""
    name = cfg.get("name")
    if name == "StandardLabelToBoundary":
        return cfg.get("mode", "thick") == "thick"
    if name == "BlobsToMask":
        return not cfg.get("boundary", False)
    if name in ("LabelToAffinities", "LabelToZAffinities", "RandomLabelToAffinities",
                "LabelToMaskAndAffinities"):
        return True
    if name == "LabelToBoundaryAndAffinities":
        return cfg.get("mode", "thick") == "thick"
    return False


def split_device_transforms(loaders_config: dict):
    """Strips device-movable transforms from the train transformer config and
    returns the device-augmentation spec (or None when disabled).

    The geometric transforms (flip/rot90/elastic) are applied identically to
    raw and label on device; intensity/noise transforms apply to raw only.
    The device transforms run AFTER the remaining host transforms. When the
    host residue includes label ENGINEERING (boundary/affinity channels) that
    has no device kernel, the order-sensitive geometric transforms
    (ElasticDeformation/RandomRotate) are kept on the host pipeline too — a
    device-side elastic applied after host engineering would produce deformed
    boundaries instead of boundaries of the deformed label.
    """
    if not loaders_config.get("device_augment", False):
        return None
    train_tf = loaders_config["train"]["transformer"]
    spec = {"paired": [], "raw_only": []}
    label_tfs = train_tf.get("label", [])
    label_names = {t["name"] for t in label_tfs}
    raw_names = {t["name"] for t in train_tf.get("raw", [])}

    # decide FIRST whether the label engineering can move: the residue after
    # stripping the paired geometric transforms must be exactly
    # [movable-engineering, plain ToTensor] (or a bare [ToTensor])
    residual = [t for t in label_tfs if not (t["name"] in _PAIRED and t["name"] in raw_names)]

    def _plain_to_tensor(cfg):
        # a normalize/dtype-carrying ToTensor runs BEFORE the engineering once
        # moved (on the raw label instead of the engineered stack) — that
        # would change the targets; only a plain float cast is safe
        return (cfg.get("name") == "ToTensor" and not cfg.get("normalize", False)
                and cfg.get("dtype", "float32") in ("float32", np.float32, float))

    post_cfg = None
    if len(residual) == 2 and _plain_to_tensor(residual[1]) and _label_post_movable(residual[0]):
        post_cfg = residual[0]
    host_engineering = (
        post_cfg is None
        and any(t.get("name") != "ToTensor" for t in residual)
    )

    movable = set(DEVICE_MOVABLE)
    if host_engineering and (_ORDER_SENSITIVE & raw_names):
        movable -= _ORDER_SENSITIVE
        from pytorch3dunet_tpu.utils import get_logger

        blockers = [t["name"] for t in residual if t.get("name") != "ToTensor"]
        get_logger("DeviceAugment").warning(
            f"label engineering {blockers} has no device kernel; keeping "
            f"{sorted(_ORDER_SENSITIVE & raw_names)} on the host pipeline so the "
            "engineering still sees the deformed label (reference ordering). "
            "Flips/rot90 still run on device."
        )

    kept_raw = []
    for t in train_tf.get("raw", []):
        if t["name"] in movable:
            if t["name"] in _PAIRED and t["name"] in label_names:
                label_cfg = next(lt for lt in train_tf["label"] if lt["name"] == t["name"])
                spec["paired"].append({"raw": dict(t), "label": dict(label_cfg)})
            else:
                spec["raw_only"].append(dict(t))
        else:
            kept_raw.append(t)
    train_tf["raw"] = kept_raw
    # strip only the label transforms that were actually MOVED (paired with a
    # raw entry); a label-only geometric transform with no raw counterpart
    # must stay in the host pipeline or it would silently be dropped
    moved_paired = {p["label"]["name"] for p in spec["paired"]}
    train_tf["label"] = [t for t in train_tf.get("label", []) if t["name"] not in moved_paired]

    # label engineering (boundary/mask/affinity channels): when the remaining
    # host label pipeline is exactly [engineering, ToTensor] and the
    # engineering op has a device kernel (post_cfg, decided above), move it
    # device-side too. Besides removing the last heavy host transform, this
    # RESTORES the reference's ordering — boundaries/affinities are computed
    # AFTER the geometric deformation, as on host.
    spec["label_post"] = None
    if post_cfg is not None:
        remaining = train_tf["label"]
        # post_cfg was decided against the same residue the strip produced
        # (the order guard only fires when post_cfg is None)
        assert len(remaining) == 2 and remaining[0] == post_cfg, remaining
        spec["label_post"] = dict(post_cfg)
        to_tensor = dict(remaining[1])
        # the raw label is now 3D on host; the channel stacking happens on device
        to_tensor["expand_dims"] = True
        train_tf["label"] = [to_tensor]
    return spec


class DeviceAugmenter:
    """Applies a split_device_transforms spec to a channels-last batch on
    device (jit + vmap over per-sample keys)."""

    def __init__(self, spec: dict):
        self.spec = spec
        self._fn = None

    def _build(self, square_hw: bool, label_is_int: bool):
        spec = self.spec

        def augment_one(key, raw, label):
            for entry in spec["paired"]:
                name = entry["raw"]["name"]
                key, k = jax.random.split(key)
                if name == "RandomFlip":
                    prob = entry["raw"].get("axis_prob", 0.5)
                    raw = random_flip(k, raw, prob)
                    label = random_flip(k, label, prob)
                elif name == "RandomRotate90":
                    if square_hw:
                        raw = random_rotate90(k, raw)
                        label = random_rotate90(k, label)
                elif name == "RandomRotate":
                    cfg = entry["raw"]
                    axes = _rotate_axes(cfg)
                    spectrum = cfg.get("angle_spectrum", 30)
                    # honor the config's interpolation order (host default 0,
                    # transforms.py RandomRotate); order 2 rounds up to cubic
                    raw_order = cfg.get("order", 0)
                    raw = random_rotate(k, raw, axes, spectrum,
                                        spline_order=3 if raw_order >= 2 else raw_order)
                    lab_order = entry["label"].get("order", 0)
                    lab_f = random_rotate(k, label.astype(jnp.float32), axes, spectrum,
                                          spline_order=3 if lab_order >= 2 else lab_order)
                    label = lab_f.astype(label.dtype) if label_is_int else lab_f
                elif name == "ElasticDeformation":
                    cfg = entry["raw"]
                    kwargs = dict(
                        alpha=cfg.get("alpha", 2000), sigma=cfg.get("sigma", 50),
                        execution_probability=cfg.get("execution_probability", 0.1),
                        apply_3d=cfg.get("apply_3d", True),
                    )
                    # honor the config's raw spline order (host default is 3,
                    # reference transforms.py:226); order 2 has no device
                    # kernel and rounds up to cubic
                    order = cfg.get("spline_order", 3)
                    raw = elastic_deformation(k, raw, spline_order=3 if order >= 2 else order, **kwargs)
                    lab_f = label.astype(jnp.float32)
                    lab_f = elastic_deformation(k, lab_f, spline_order=0, **kwargs)
                    label = lab_f.astype(label.dtype) if label_is_int else lab_f

            for cfg in spec["raw_only"]:
                key, k = jax.random.split(key)
                name = cfg["name"]
                if name == "AdditiveGaussianNoise":
                    raw = additive_gaussian_noise(k, raw, tuple(cfg.get("scale", (0.0, 1.0))),
                                                  cfg.get("execution_probability", 0.1))
                elif name == "AdditivePoissonNoise":
                    raw = additive_poisson_noise(k, raw, tuple(cfg.get("lam", (0.0, 1.0))),
                                                 cfg.get("execution_probability", 0.1))
                elif name == "GaussianBlur3D":
                    raw = gaussian_blur(k, raw, tuple(cfg.get("sigma", (0.1, 2.0))),
                                        cfg.get("execution_probability", 0.5))
                elif name == "RandomContrast":
                    raw = random_contrast(k, raw, tuple(cfg.get("alpha", (0.5, 1.5))),
                                          cfg.get("mean", 0.0), cfg.get("execution_probability", 0.1))
                elif name == "RandomFlip":
                    raw = random_flip(k, raw, cfg.get("axis_prob", 0.5))
                elif name == "RandomRotate90" and square_hw:
                    raw = random_rotate90(k, raw)
                elif name == "RandomRotate":
                    raw_order = cfg.get("order", 0)
                    raw = random_rotate(k, raw, _rotate_axes(cfg), cfg.get("angle_spectrum", 30),
                                        spline_order=3 if raw_order >= 2 else raw_order)
                elif name == "ElasticDeformation":
                    order = cfg.get("spline_order", 3)
                    raw = elastic_deformation(k, raw, spline_order=3 if order >= 2 else order,
                                              alpha=cfg.get("alpha", 2000), sigma=cfg.get("sigma", 50),
                                              execution_probability=cfg.get("execution_probability", 0.1),
                                              apply_3d=cfg.get("apply_3d", True))

            post = spec.get("label_post")
            if post is not None:
                lab3 = label[..., 0].astype(jnp.float32)  # single-channel raw label
                name = post["name"]
                if name == "StandardLabelToBoundary":
                    label = standard_label_to_boundary(
                        lab3, ignore_index=post.get("ignore_index"),
                        append_label=post.get("append_label", False),
                        foreground=post.get("foreground", False),
                    )
                elif name == "BlobsToMask":
                    label = blobs_to_mask(lab3, append_label=post.get("append_label", False))
                elif name == "LabelToAffinities":
                    label = label_to_affinities(
                        lab3, post["offsets"], z_offsets=post.get("z_offsets"),
                        aggregate_affinities=post.get("aggregate_affinities", False),
                        append_label=post.get("append_label", False),
                        ignore_index=post.get("ignore_index"),
                    )
                elif name == "LabelToZAffinities":
                    label = label_to_z_affinities(
                        lab3, post["offsets"],
                        append_label=post.get("append_label", False),
                        ignore_index=post.get("ignore_index"),
                    )
                elif name == "RandomLabelToAffinities":
                    key, kpost = jax.random.split(key)
                    label = random_label_to_affinities(
                        kpost, lab3, max_offset=post.get("max_offset", 10),
                        z_offset_scale=post.get("z_offset_scale", 2),
                        append_label=post.get("append_label", False),
                        ignore_index=post.get("ignore_index"),
                    )
                elif name == "LabelToBoundaryAndAffinities":
                    label = label_to_boundary_and_affinities(
                        lab3, post["xy_offsets"], post["z_offsets"],
                        append_label=post.get("append_label", False),
                        ignore_index=post.get("ignore_index"),
                        foreground=post.get("foreground", False),
                    )
                elif name == "LabelToMaskAndAffinities":
                    label = label_to_mask_and_affinities(
                        lab3, post["xy_offsets"], post["z_offsets"],
                        append_label=post.get("append_label", False),
                        background=post.get("background", 0),
                        ignore_index=post.get("ignore_index"),
                    )
                else:  # unreachable: _label_post_movable gates the names
                    raise ValueError(f"no device kernel for label engineering '{name}'")
            return raw, label

        return jax.jit(jax.vmap(augment_one))

    def __call__(self, key, raw_batch, label_batch):
        """raw_batch: (N, D, H, W, C); label_batch: same layout (or int class map
        with a trailing channel added by the caller)."""
        square = raw_batch.shape[2] == raw_batch.shape[3]
        label_is_int = jnp.issubdtype(label_batch.dtype, jnp.integer)
        if self._fn is None:
            has_rot90 = any(e["raw"]["name"] == "RandomRotate90" for e in self.spec["paired"]) or any(
                c["name"] == "RandomRotate90" for c in self.spec["raw_only"]
            )
            if not square and has_rot90:
                from pytorch3dunet_tpu.utils import get_logger

                get_logger("DeviceAugment").warning(
                    f"RandomRotate90 needs square H/W patches on device (got {raw_batch.shape[2]}x"
                    f"{raw_batch.shape[3]}); the transform is SKIPPED — use square patches or "
                    "device_augment: false to keep it"
                )
            self._fn = self._build(square, label_is_int)
        keys = jax.random.split(key, raw_batch.shape[0])
        return self._fn(keys, raw_batch, label_batch)
