"""Device-side sliding-window inference: the whole patch sweep in one jit.

The reference predicts patch-by-patch in a Python loop with per-patch
host->device->host transfers (pytorch3dunet/unet3d/predictor.py:148-193). On
TPU this wastes the chip on transfer latency. Here the mirror-padded volume is
uploaded once, a `lax.fori_loop` sweeps the (static) patch grid with
`dynamic_slice` -> forward -> halo-crop -> `dynamic_update_slice` stitching,
and the assembled prediction comes back in a single download.

Also implements the Gaussian-blend stitching upgrade: each patch core is
weighted by a separable Gaussian window and accumulated; overlapping patches
blend smoothly instead of overwriting (with stride == patch there is no
overlap and blending reduces to assignment, reproducing reference behavior).

Normalization: the common test-transformer pipelines are applied on device —
`Standardize` with volume stats (global_normalization) or per-patch stats, and
min-max `Normalize`; exotic pipelines fall back to the host predictor.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("DeviceSlidingWindow")


def _gaussian_window(shape, sigma_scale=0.125, dtype=jnp.float32):
    """Separable Gaussian weight window over a patch core (peak 1 at center)."""
    ws = []
    for s in shape:
        x = np.arange(s) - (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1.0)
        ws.append(np.exp(-0.5 * (x / sigma) ** 2))
    w = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    return jnp.asarray(np.maximum(w, 1e-3), dtype=dtype)


class DeviceSlidingWindow:
    """Jit-compiled sliding-window sweep for one (model, patch grid) setup.

    Args:
        model: UNetModel (3D).
        patch_shape: core patch shape (D, H, W) from the slice builder.
        halo_shape: halo on each side; the network sees patch + 2*halo.
        normalize: 'standardize' | 'standardize_patch' | 'normalize' | None.
        stats: dict with 'mean'/'std' when normalize == 'standardize'.
        blend: 'assign' (reference parity) or 'gaussian' (weighted blending).
    """

    def __init__(self, model, patch_shape, halo_shape, normalize=None, stats=None, blend="assign"):
        self.model = model
        self.patch_shape = tuple(patch_shape)
        self.halo_shape = tuple(halo_shape)
        self.normalize = normalize
        self.stats = stats or {}
        self.blend = blend
        assert blend in ("assign", "gaussian")

    def _normalize_patch(self, patch):
        if self.normalize == "standardize":
            mean = jnp.float32(self.stats["mean"])
            std = jnp.float32(self.stats["std"])
            return (patch - mean) / jnp.clip(std, 1e-10)
        if self.normalize == "standardize_patch":
            mean = jnp.mean(patch)
            std = jnp.std(patch)
            return (patch - mean) / jnp.clip(std, 1e-10)
        if self.normalize == "normalize":
            lo = jnp.min(patch)
            hi = jnp.max(patch)
            return jnp.clip(2 * (patch - lo) / (hi - lo + 1e-10) - 1, -1, 1)
        return patch

    @partial(jax.jit, static_argnums=(0,), donate_argnums=())
    def _sweep(self, variables, padded_volume, starts):
        """padded_volume: (Dp, Hp, Wp, Cin); starts: (P, 3) core-start indices."""
        hz, hy, hx = self.halo_shape
        cz, cy, cx = self.patch_shape
        pz, py, px = cz + 2 * hz, cy + 2 * hy, cx + 2 * hx
        cin = padded_volume.shape[-1]
        cout = self.model.out_channels

        out_spatial = tuple(s - 2 * h for s, h in zip(padded_volume.shape[:3], self.halo_shape))
        out = jnp.zeros((*out_spatial, cout), dtype=jnp.float32)
        if self.blend == "gaussian":
            weights = jnp.zeros(out_spatial, dtype=jnp.float32)
            window = _gaussian_window(self.patch_shape)
        else:
            weights = None
            window = None

        def body(i, carry):
            out, weights = carry
            s = starts[i]
            patch = jax.lax.dynamic_slice(padded_volume, (s[0], s[1], s[2], 0), (pz, py, px, cin))
            patch = self._normalize_patch(patch)
            probs, _ = self.model.module.apply(variables, patch[None], train=False)
            core = probs[0, hz : hz + cz, hy : hy + cy, hx : hx + cx, :].astype(jnp.float32)
            if self.blend == "gaussian":
                core = core * window[..., None]
                prev_w = jax.lax.dynamic_slice(weights, (s[0], s[1], s[2]), self.patch_shape)
                prev = jax.lax.dynamic_slice(out, (s[0], s[1], s[2], 0), (*self.patch_shape, cout))
                out = jax.lax.dynamic_update_slice(out, prev + core, (s[0], s[1], s[2], 0))
                weights = jax.lax.dynamic_update_slice(weights, prev_w + window, (s[0], s[1], s[2]))
            else:
                out = jax.lax.dynamic_update_slice(out, core, (s[0], s[1], s[2], 0))
            return out, weights

        out, weights = jax.lax.fori_loop(0, starts.shape[0], body, (out, weights))
        if self.blend == "gaussian":
            out = out / weights[..., None]
        return out

    def __call__(self, variables, padded_volume: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """Runs the sweep; returns the stitched (D, H, W, Cout) volume."""
        padded_volume = jnp.asarray(padded_volume, dtype=jnp.float32)
        if padded_volume.ndim == 3:
            padded_volume = padded_volume[..., None]
        starts = jnp.asarray(starts, dtype=jnp.int32)
        return np.asarray(self._sweep(variables, padded_volume, starts))


def detect_device_path(transformer_config, global_stats) -> tuple[str | None, dict] | None:
    """Maps a test raw-transformer config onto the on-device normalization ops.

    Returns (normalize_mode, stats) when the pipeline is supported, else None.
    """
    names = [t["name"] for t in transformer_config]
    tail = [n for n in names if n != "ToTensor"]
    if tail == ["Standardize"]:
        cfg = next(t for t in transformer_config if t["name"] == "Standardize")
        if "mean" in cfg or (global_stats and global_stats.get("mean") is not None):
            stats = {"mean": cfg.get("mean", (global_stats or {}).get("mean")),
                     "std": cfg.get("std", (global_stats or {}).get("std"))}
            return "standardize", stats
        return "standardize_patch", {}
    if tail == ["Normalize"]:
        return "normalize", {}
    if tail == []:
        return None, {}
    return None
