"""Device-side sliding-window inference throughput on v5e (tunnel-immune).

Measures the single-dispatch sweep (inference_device.DeviceSlidingWindow) on
the canonical geometry: volume 128x320x320, patch 64x160x160, halo 8x16x16,
bf16 compute — end-to-end voxels/sec including halo-overlap redundancy.
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow  # noqa: E402
from pytorch3dunet_tpu.models import get_model  # noqa: E402


def main_2d(patch_batch=16):
    """2D-model sweep over a z-stack: singleton-z patches, `patch_batch`
    slices per batched forward dispatch."""
    model = get_model({
        "name": "UNet2D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
        "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
        "dtype": "bfloat16",
    })
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(128, 128))

    vol = (64, 512, 512)
    patch = (1, 256, 256)
    halo = (0, 32, 32)
    rs = np.random.RandomState(0)
    padded = np.pad(rs.rand(*vol).astype(np.float32), tuple((h, h) for h in halo), mode="reflect")
    starts = np.asarray([(z, y, x) for z in range(64) for y in (0, 256) for x in (0, 256)], np.int32)

    sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo,
                                normalize="standardize_patch", patch_batch=patch_batch)
    warm, dt = _timed_sweeps(sweep, variables, padded, starts)
    vox = int(np.prod(vol))
    print(f"2D B={patch_batch}: warm {warm:.2f}s, steady {dt*1e3:.1f} ms -> "
          f"{vox/dt/1e6:.1f} Mvox/s device-side")


def main(patch_batch=1, tta=False):
    model = get_model({
        "name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
        "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
        "dtype": "bfloat16",
    })
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(32, 64, 64))

    vol = (128, 320, 320)
    patch = (64, 160, 160)
    halo = (8, 16, 16)
    rs = np.random.RandomState(0)
    padded = np.pad(rs.rand(*vol).astype(np.float32), tuple((h, h) for h in halo), mode="reflect")
    starts = np.asarray([(z, y, x) for z in (0, 64) for y in (0, 160) for x in (0, 160)], np.int32)

    sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo,
                                normalize="standardize_patch", patch_batch=patch_batch,
                                tta_axes=(0, 1, 2) if tta else ())
    warm, dt = _timed_sweeps(sweep, variables, padded, starts)
    vox = int(np.prod(vol))
    print(f"3D B={patch_batch} tta={tta}: warm {warm:.2f}s, steady {dt*1e3:.1f} ms -> "
          f"{vox/dt/1e6:.1f} Mvox/s device-side")


def main_2d_fullplane(patch_batch=8):
    """2D sweep with full-plane patches: the patch spans the whole xy plane,
    so there are no patch borders and no halo at all — zero redundant compute
    (the tiled 256x256+halo(32,32) grid recomputes 1.56x) and 4x-larger GEMMs
    per forward. Image-global GN stats then see the full plane, which is also
    closer to the reference's whole-image 2D semantics."""
    model = get_model({
        "name": "UNet2D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
        "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
        "dtype": "bfloat16",
    })
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(128, 128))

    vol = (64, 512, 512)
    patch = (1, 512, 512)
    halo = (0, 0, 0)
    rs = np.random.RandomState(0)
    padded = rs.rand(*vol).astype(np.float32)
    starts = np.asarray([(z, 0, 0) for z in range(64)], np.int32)

    sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo,
                                normalize="standardize_patch", patch_batch=patch_batch)
    warm, dt = _timed_sweeps(sweep, variables, padded, starts)
    vox = int(np.prod(vol))
    print(f"2D full-plane B={patch_batch}: warm {warm:.2f}s, steady {dt*1e3:.1f} ms -> "
          f"{vox/dt/1e6:.1f} Mvox/s device-side")


def main_slab(slab_z=32, vol_d=128, halo=(8, 0, 0)):
    """Full-xy z-slab geometry: patches span the whole xy plane so the halo
    (and its redundant compute) is needed only along z. On the canonical
    128x320x320 volume the canonical 64x160x160+halo(8,16,16) grid recomputes
    1.8x the volume; a 32x320x320 slab with halo (8,0,0) recomputes 1.5x and
    a 64-slab 1.25x. Measures whether the saved redundancy survives the
    layout change end-to-end."""
    model = get_model({
        "name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
        "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
        "dtype": "bfloat16",
    })
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(32, 64, 64))

    vol = (vol_d, 320, 320)
    patch = (slab_z, 320, 320)
    rs = np.random.RandomState(0)
    padded = np.pad(rs.rand(*vol).astype(np.float32), tuple((h, h) for h in halo), mode="reflect")
    # SliceBuilder-style z coverage: stride == slab with a flush tail patch
    zs = list(range(0, vol_d - slab_z + 1, slab_z))
    if zs[-1] + slab_z < vol_d:
        zs.append(vol_d - slab_z)
    starts = np.asarray([(z, 0, 0) for z in zs], np.int32)

    sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo,
                                normalize="standardize_patch", patch_batch=1)
    warm, dt = _timed_sweeps(sweep, variables, padded, starts)
    vox = int(np.prod(vol))
    print(f"3D slab z={slab_z} vol_d={vol_d} halo={halo}: warm {warm:.2f}s, "
          f"steady {dt*1e3:.1f} ms -> {vox/dt/1e6:.1f} Mvox/s device-side", flush=True)


def _timed_sweeps(sweep, variables, padded, starts, n=5):
    """Times the sweep tunnel-immune: N sweeps run inside ONE dispatch
    (lax.scan, key-perturbed volume) so the seconds-long host<->device RTT of
    this environment's tunnel is amortized away — a single-dispatch timing
    overstates the sweep itself ~3x here (285 ms device vs 775 ms wall)."""
    import jax.numpy as jnp

    padded_dev = jax.device_put(jnp.asarray(padded, jnp.float32)[..., None])
    starts_dev = jnp.asarray(starts, jnp.int32)
    stats = sweep._stats_pytree()

    @jax.jit
    def run(seed):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            eps = jax.random.uniform(k, (), dtype=jnp.float32) * 1e-6
            out, _w = sweep._accumulate(variables, padded_dev + eps, starts_dev,
                                        weighted=sweep.weighted, stats=stats)
            return (acc + jnp.sum(out[0, 0, :4, 0]), key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n)
        return acc

    t0 = time.perf_counter()
    _ = float(run(jax.random.PRNGKey(0)))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / n
    return warm, dt


if __name__ == "__main__":
    if "2d" in sys.argv[1:]:
        for b in (1, 16):
            main_2d(patch_batch=b)
    elif "tta" in sys.argv[1:]:
        main(patch_batch=1, tta=True)
    elif "slab" in sys.argv[1:]:
        zs = [int(a) for a in sys.argv[2:] if a.isdigit()] or [32, 64]
        for z in zs:
            main_slab(slab_z=z)
    elif "slabmatrix" in sys.argv[1:]:
        # deeper-volume matrix for picking the bench/recipe geometry
        main_slab(slab_z=128, vol_d=256, halo=(8, 0, 0))
        main_slab(slab_z=128, vol_d=256, halo=(8, 16, 16))
        main_slab(slab_z=256, vol_d=256, halo=(8, 0, 0))
    elif "slabcap" in sys.argv[1:]:
        # capacity validation for the max_patch_voxels default (2**25): a
        # 320^3 padded slab, and the bench geometry (512-deep, two 256-slabs)
        main_slab(slab_z=304, vol_d=304, halo=(8, 0, 0))
        main_slab(slab_z=256, vol_d=512, halo=(8, 0, 0))
    elif "2dplane" in sys.argv[1:]:
        for b in (4, 8, 16):
            main_2d_fullplane(patch_batch=b)
    else:
        for b in ([1, 2, 4] if "bsweep" in sys.argv[1:] else [1]):
            main(patch_batch=b)
