"""Sliding-window predictors: patch inference + halo removal + volume stitching.

Workflow parity with the reference (pytorch3dunet/unet3d/predictor.py):
`StandardPredictor` keeps the assembled volume in RAM, `LazyPredictor` writes
patches straight into a chunked gzip H5 dataset, `DSB2018Predictor` handles
per-image 2D prediction with connected-component segmentation. Patches arrive
halo-padded from the test dataset (hdf5.py:160-173); the prediction halo is
cropped and the core is assigned at the patch index (no overlap at
stride==patch, so stitching is pure assignment).

TPU-first: the forward pass is one jitted function reused across all patches
of equal shape; batches are fed asynchronously (JAX dispatch overlaps the
host-side stitching of patch i with device compute of patch i+1).
"""

import os
import time
from pathlib import Path

import h5py
import jax
import numpy as np

from pytorch3dunet_tpu.datasets.hdf5 import AbstractHDF5Dataset
from pytorch3dunet_tpu.datasets.utils import remove_padding
from pytorch3dunet_tpu.models import is_model_2d
from pytorch3dunet_tpu.utils import get_logger
from pytorch3dunet_tpu.utils.ndimage import label as cc_label

logger = get_logger("UNetPredictor")


class AbstractPredictor:
    """Base class for predictors.

    Args:
        model: UNetModel to run.
        variables: model variables pytree (params [+ batch stats]).
        output_dir: directory for prediction H5 files.
        out_channels: number of output channels of the model.
        device: target device ('tpu' | 'cpu').
        output_dataset: name of the H5 dataset for predictions.
        save_segmentation: save an argmax/binarized segmentation instead of
            probability maps.
        prediction_channel: save only this channel of the network output.
        performance_metric: optional 'dice' | 'mean_iou' post-hoc evaluation.
        gt_internal_path: H5 path of the ground truth for the evaluation.
        tta: mirror-flip test-time augmentation — average the probabilities
            over every flip combination of the spatial axes (8 forwards for a
            3D model, 4 for 2D). A TPU-native addition (no reference
            counterpart); the ensemble runs inside the jitted forward.
        tta_axes: restrict mirroring to these axes (0=z, 1=y, 2=x).
    """

    def __init__(self, model, variables, output_dir, out_channels, device=None,
                 output_dataset="predictions", save_segmentation=False, prediction_channel=None,
                 performance_metric=None, gt_internal_path=None, tta=False, tta_axes=None, **kwargs):
        self.model = model
        self.variables = variables
        self.output_dir = output_dir
        assert out_channels > 0, f"Invalid number of output channels: {out_channels}"
        self.out_channels = out_channels
        self.device = device
        self.output_dataset = output_dataset
        self.save_segmentation = save_segmentation
        self.prediction_channel = prediction_channel
        self.performance_metric = performance_metric
        self.gt_internal_path = gt_internal_path
        self.tta = tta
        self.tta_axes = tta_axes
        if tta:
            logger.info(f"Test-time mirror augmentation on (axes: {self._tta_patch_axes()})")
        self._forward_fn = None

    def _tta_patch_axes(self) -> tuple[int, ...]:
        """Patch-space (z, y, x) axes the TTA ensemble mirrors; () when off."""
        from pytorch3dunet_tpu.ops.tta import resolve_tta_axes

        return resolve_tta_axes(self.tta, self.tta_axes, is_model_2d(self.model))

    def _tta_wrap(self, run, two_d: bool):
        """Wraps a channels-last batch forward `run` with the mirror ensemble.

        Model-ready layouts: (N, D, H, W, C) for 3D — patch axis k is array
        axis k+1; (N, H, W, C) for 2D — patch axes 1/2 (y/x) are array 1/2.
        """
        axes = self._tta_patch_axes()
        if not axes:
            return run
        from pytorch3dunet_tpu.ops.tta import flip_combos, tta_average

        combos = flip_combos(axes if two_d else tuple(a + 1 for a in axes))
        return lambda x: tta_average(run, x, combos)

    def _to_segmentation(self, probs: np.ndarray, channel_axis: int = 0) -> np.ndarray:
        """Binarize (>0.5, single channel) or argmax over `channel_axis`, uint16
        (reference predictor.py:172-179)."""
        if probs.shape[channel_axis] == 1:
            return (np.take(probs, 0, axis=channel_axis) > 0.5).astype("uint16")
        return np.argmax(probs, axis=channel_axis).astype("uint16")

    def _evaluate(self, prediction_array: np.ndarray, dataset):
        """Post-hoc dice/mean_iou against gt_internal_path (predictor.py:201-214)."""
        assert self.gt_internal_path is not None
        gt = _load_dataset(dataset, self.gt_internal_path)
        assert self.performance_metric in ["dice", "mean_iou"], (
            f"Unsupported performance metric: {self.performance_metric}, only dice and mean_iou are supported"
        )
        if self.performance_metric == "dice":
            return dice_score(prediction_array, gt)
        return mean_iou(prediction_array, gt, n_classes=self.out_channels)

    def _forward(self, batch_ncdhw: np.ndarray) -> np.ndarray:
        """Jitted channels-last forward; input/output in NC(D)HW layout."""
        if self._forward_fn is None:
            model = self.model
            two_d = is_model_2d(model)

            def fwd(variables, x):
                run = self._tta_wrap(
                    lambda xi: model.module.apply(variables, xi, train=False)[0], two_d
                )
                return run(x)

            self._forward_fn = jax.jit(fwd)

        inp = np.moveaxis(np.asarray(batch_ncdhw, dtype=np.float32), 1, -1)
        if is_model_2d(self.model):
            # strip the singleton z-dim (reference predictor.py:154-160)
            inp = np.squeeze(inp, axis=1)
        probs = self._forward_fn(self.variables, inp)
        probs = np.asarray(probs)
        if is_model_2d(self.model):
            probs = probs[:, None]
        return np.moveaxis(probs, -1, 1)

    def __call__(self, test_loader):
        raise NotImplementedError

    def finalize(self):
        """Drains any deferred output work (write-behind saves). Host-loop
        predictors save inline, so the base is a no-op; call after the last
        volume (predict3dunet does)."""


class StandardPredictor(AbstractPredictor):
    """Keeps the stitched prediction volume in RAM, saves it as gzip H5."""

    def __call__(self, test_loader):
        assert isinstance(test_loader.dataset, AbstractHDF5Dataset)
        logger.info(f"Processing '{test_loader.dataset.file_path}'...")
        start = time.perf_counter()

        volume_shape = test_loader.dataset.volume_shape
        if self.save_segmentation:
            prediction_shape = volume_shape
        elif self.prediction_channel is not None:
            prediction_shape = (1,) + volume_shape
        else:
            prediction_shape = (self.out_channels,) + volume_shape

        output_file = _get_output_file(dataset=test_loader.dataset, output_dir=self.output_dir)
        logger.info(f"Saving predictions to: {output_file}")
        with h5py.File(output_file, "w") as h5_output_file:
            logger.info("Allocating prediction arrays...")
            prediction_array = self._allocate_prediction_array(prediction_shape, h5_output_file)

            patch_halo = test_loader.dataset.halo_shape
            logger.info(f"Using halo: {patch_halo}")
            logger.info(f"Running inference on {len(test_loader)} batches")

            for batch, indices in test_loader:
                prediction = self._forward(batch)
                if sum(patch_halo) > 0:
                    prediction = remove_padding(prediction, patch_halo)

                for pred, index in zip(prediction, indices):
                    if self.save_segmentation:
                        if pred.shape[0] == 1:
                            pred = pred[0] > 0.5
                        else:
                            pred = np.argmax(pred, axis=0)
                        pred = pred.astype("uint16")
                        index = tuple(index)
                    else:
                        if self.prediction_channel is None:
                            channel_slice = slice(0, self.out_channels)
                        else:
                            channel_slice = slice(0, 1)
                            pred = np.expand_dims(pred[self.prediction_channel], axis=0)
                        index = (channel_slice,) + tuple(index)

                    prediction_array[index] = pred

            logger.info(f"Finished inference in {time.perf_counter() - start:.2f} seconds")
            output_type = "segmentation" if self.save_segmentation else "probability maps"
            logger.info(f"Saving {output_type} to: {output_file}")
            self._create_prediction_dataset(h5_output_file, prediction_array)

            if self.performance_metric is not None:
                return self._evaluate(prediction_array[...], test_loader.dataset)
        return None

    def _create_prediction_dataset(self, h5_output_file, prediction_array):
        h5_output_file.create_dataset(self.output_dataset, data=prediction_array, compression="gzip")

    def _allocate_prediction_array(self, output_shape, output_file):
        dtype = "uint16" if self.save_segmentation else "float32"
        return np.zeros(output_shape, dtype=dtype)


class LazyPredictor(StandardPredictor):
    """Streams predicted patches straight into a chunked H5 dataset — for
    volumes that do not fit in RAM."""

    def _allocate_prediction_array(self, output_shape, output_file):
        dtype = "uint16" if self.save_segmentation else "float32"
        return output_file.create_dataset(
            self.output_dataset, shape=output_shape, dtype=dtype, chunks=True, compression="gzip"
        )

    def _create_prediction_dataset(self, h5_output_file, prediction_array):
        # patches were written directly into the H5 dataset
        pass


def _read_padded_slab(raw, halo_shape, z_lo: int, z_hi: int) -> np.ndarray:
    """Returns `mirror_pad(volume, halo_shape)[z_lo:z_hi]` as a channels-last
    float32 slab WITHOUT materializing the padded volume.

    `raw` is an h5py dataset or ndarray, (D, H, W) or channels-first
    (C, D, H, W). The z planes are fetched with one contiguous read (reflected
    indices gathered host-side), then H/W are reflect-padded per slab — this
    is how bigger-than-RAM volumes reach the device sweep (capability parity
    with the reference's Lazy pairing, datasets/hdf5.py:284-335).
    """
    channels_first = raw.ndim == 4
    depth = int(raw.shape[1] if channels_first else raw.shape[0])
    hz, hy, hx = halo_shape
    if hz >= depth and hz > 0:
        # same condition under which np.pad(mode='reflect') raises in
        # mirror_pad: a single reflection cannot cover the halo
        raise ValueError(f"halo depth {hz} must be smaller than the volume depth {depth}")
    idx = np.arange(z_lo, z_hi) - hz
    idx = np.abs(idx)  # reflect at the top edge
    idx = np.where(idx >= depth, 2 * depth - 2 - idx, idx)  # reflect at the bottom
    lo, hi = int(idx.min()), int(idx.max())
    block = raw[:, lo : hi + 1] if channels_first else raw[lo : hi + 1]
    block = np.asarray(block, dtype=np.float32)
    slab = block[:, idx - lo] if channels_first else block[idx - lo]
    if channels_first:
        slab = np.moveaxis(slab, 0, -1)  # (dz, H, W, C)
    pad = [(0, 0), (hy, hy), (hx, hx)] + ([(0, 0)] if channels_first else [])
    if hy or hx:
        slab = np.pad(slab, pad, mode="reflect")
    return slab


def _plan_slab_grid(spatial, patch_shape, halo_shape, cin, budget, min_slab_z=64):
    """Plans the `patch_mode: slab` geometry: full-xy z-slabs replacing the
    configured (z, y, x) patch grid.

    Each slab covers the whole padded plane, so interior xy seams (and their
    halo'd redundant compute) vanish; the configured halo still mirror-pads
    every patch on all sides, preserving the reference's volume-edge context
    (reference datasets/utils.py mirror_pad semantics). Slab depth is the
    largest core z such that the padded slab fits `budget` voxels, covered
    SliceBuilder-style (stride == slab, tail slab shifted flush to the end).

    Returns (slab_patch_shape, starts) or None when no slab of at least
    `min_slab_z` (or the configured patch depth, if larger) fits — thin slabs
    measured SLOWER than the plain grid (32-plane slabs: 25 vs 45 Mvox/s,
    BENCH_NOTES r4), so small budgets keep the user's grid rather than
    degrade it.
    """
    d, h, w = (int(s) for s in spatial)
    hz, hy, hx = halo_shape
    plane = (h + 2 * hy) * (w + 2 * hx) * cin
    slab_z = min(d, int(budget) // plane - 2 * hz)
    if slab_z < d and slab_z < max(min_slab_z, patch_shape[0]):
        return None
    return (slab_z, h, w), _slab_starts(d, slab_z)


def _slab_starts(d, slab_z):
    """SliceBuilder-style z coverage: stride == slab, tail shifted flush."""
    zs = list(range(0, d - slab_z + 1, slab_z))
    if zs[-1] + slab_z < d:
        zs.append(d - slab_z)
    return np.asarray([(z, 0, 0) for z in zs], dtype=np.int32)


def _axis_starts(extent, size):
    """Flush-tail tiling of one axis (the 1-D _slab_starts)."""
    ss = list(range(0, extent - size + 1, size))
    if ss[-1] + size < extent:
        ss.append(extent - size)
    return ss


def _plan_strip_grid(spatial, patch_shape, halo_shape, cin, budget, min_strip=64):
    """Intermediate 'strip' geometry between slab and grid (r4 verdict #3):
    when the xy plane alone exceeds the budget (no full-plane slab can form),
    plan full-x (or full-y) strips — one spatial axis spans the whole volume,
    so interior seams (and their halo'd redundant compute) survive only on the
    two SHORT axes. Redundancy lands between the slab's ~1.06x and the grid's
    ~1.8x at the canonical halo.

    Both orientations are scored by total padded compute (number of strips x
    padded strip voxels, flush-tail coverage) and the cheaper one wins. Strips
    thinner than `min_strip` (or the configured patch size) on either short
    axis are refused, like thin slabs (measured loss, BENCH_NOTES r4).

    Returns ((sz, sy, sx), starts) or None.
    """
    d, h, w = (int(s) for s in spatial)
    hz, hy, hx = halo_shape
    floor_z = max(min_strip, patch_shape[0])

    def plan(full_axis):
        # full_axis: 2 -> full-x strips (tile z, y); 1 -> full-y (tile z, x)
        full_len, full_halo = (w, hx) if full_axis == 2 else (h, hy)
        short_len, short_halo = (h, hy) if full_axis == 2 else (w, hx)
        floor_s = max(min_strip, patch_shape[full_axis ^ 3])  # 2^3=1, 1^3=2
        cells = int(budget) // ((full_len + 2 * full_halo) * cin)
        best = None
        for sz in range(min(d, floor_z), min(d, max(floor_z, cells)) + 1):
            ss = cells // (sz + 2 * hz) - 2 * short_halo
            ss = min(ss, short_len)
            if ss < min(short_len, floor_s):
                continue
            n = len(_axis_starts(d, sz)) * len(_axis_starts(short_len, ss))
            padded = n * (sz + 2 * hz) * (ss + 2 * short_halo) * (full_len + 2 * full_halo)
            if best is None or padded < best[0]:
                best = (padded, sz, ss)
        if best is None:
            return None
        _, sz, ss = best
        if full_axis == 2:
            shape = (sz, ss, w)
            starts = [(z, y, 0) for z in _axis_starts(d, sz) for y in _axis_starts(h, ss)]
        else:
            shape = (sz, h, ss)
            starts = [(z, 0, x) for z in _axis_starts(d, sz) for x in _axis_starts(w, ss)]
        return best[0], shape, np.asarray(starts, dtype=np.int32)

    plans = [p for p in (plan(2), plan(1)) if p is not None]
    if not plans:
        return None
    _, shape, starts = min(plans, key=lambda p: p[0])
    return shape, starts


def _plan_plane_grid(spatial, halo_shape, cin, budget, patch_batch):
    """2D arm of `patch_mode: slab`: full-plane singleton-z patches replace
    the xy tile grid — no tile borders, no redundant halo compute, and
    GroupNorm statistics see the whole plane (the reference's whole-image 2D
    semantics). `patch_batch` planes ride one forward, so the budget bounds
    patch_batch * padded plane. Returns ((1, H, W), starts) or None."""
    d, h, w = (int(s) for s in spatial)
    _, hy, hx = halo_shape
    if (h + 2 * hy) * (w + 2 * hx) * cin * max(1, patch_batch) > int(budget):
        return None
    starts = np.asarray([(z, 0, 0) for z in range(d)], dtype=np.int32)
    return (1, h, w), starts


class DeviceSlidingWindowPredictor(StandardPredictor):
    """Sliding-window prediction with the patch sweep running on device.

    The mirror-padded volume is uploaded once; a jitted lax.fori_loop performs
    slice -> forward -> halo-crop -> stitch for the whole patch grid (see
    inference_device.py). 2D models sweep the same grid with singleton-z
    patches (z feeds the model as the batch dim). Falls back to the host loop
    (StandardPredictor) for unsupported transformer pipelines.

    Multi-chip: when more than one device is visible, the patch grid is
    sharded across a 1-D data mesh (each chip predicts a disjoint patch
    subset; partial volumes merge with one psum) — the TPU-native analog of
    the reference's DataParallel inference (predict.py:63-67).

    Large volumes: when the padded volume exceeds `max_device_voxels`
    elements, the grid is processed in z-slabs, uploading one sub-volume at a
    time (device-side counterpart of the LazyPredictor).

    Extra config keys:
        blend: 'assign' (default, reference parity) or 'gaussian'
            (Gaussian-weighted patch blending for overlapping grids).
        shard: split the patch grid across all visible devices (default true).
        max_device_voxels: slab the sweep when the padded volume is larger
            than this many elements (default 1e9).
        patch_batch: patches per forward dispatch (default 1 for 3D models,
            16 for 2D — singleton-z slices underfill the chip at batch 1;
            full-plane slab plans default to 24, the measured sweet spot,
            stepping down to 16 if `max_patch_voxels` refuses 24 planes).
        patch_mode: 'grid' (default) sweeps the configured patch grid
            unchanged (reference-exact patch independence). 'slab' coalesces
            the grid into full-xy z-slabs as deep as `max_patch_voxels`
            allows: interior patch seams disappear entirely and the halo's
            redundant compute is paid only along z (measured 45 -> 77 Mvox/s
            on the canonical geometry, BENCH_NOTES r4). The configured halo
            keeps its role as mirror-pad context at the volume faces and at
            slab boundaries. Outputs differ from 'grid' near former interior
            seams (each grid patch was predicted independently there). For 2D
            models the slabs are full-plane singleton-z patches (no tile
            borders; GroupNorm sees the whole plane — the reference's
            whole-image 2D semantics). Falls back to the grid with a warning
            when the plane is too large for a worthwhile slab. On a mesh
            with more devices than slabs, each slab's z-axis is sharded
            across ALL devices cooperatively (halo-exchanged convs + psum'd
            GroupNorm, parallel/spatial.py) when the model family allows it,
            so the slab geometry no longer idles chips; otherwise the
            grid-over-mesh split is kept.
        write_behind: run the gzip H5 output write on a background thread so
            the next volume's sweep overlaps it (default true). Costs up to
            ~2x peak host memory on directory jobs (the previous volume's
            full fp32 prediction stays alive during the next volume); set
            false to restore inline saves on memory-constrained hosts.
        max_patch_voxels: padded-voxel budget for one slab forward in
            'slab' mode. The default 2**24 is conservative for f_maps=32
            bf16 on a 16 GB v5e; measured there: a 31.1M-voxel slab
            (304x320x320) fits and is the fastest geometry (85.6 Mvox/s),
            32.8M (320^3) alloc-thrashes (BENCH_NOTES r4/r5) — raise toward
            ~3.1e7 for maximum throughput, lower for wider models.
    """

    def __init__(self, *args, blend="assign", shard=True, max_device_voxels=int(1e9), patch_batch=None,
                 patch_mode="grid", max_patch_voxels=2**24, write_behind=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.blend = blend
        self.write_behind = bool(write_behind)
        self.shard = shard
        self.max_device_voxels = max_device_voxels
        self.patch_batch = patch_batch
        assert patch_mode in ("grid", "slab"), f"unknown patch_mode: {patch_mode!r}"
        self.patch_mode = patch_mode
        self.max_patch_voxels = int(max_patch_voxels)
        # set by _plan_geometry when the full-plane 2D plan picks its own
        # patch_batch (the measured full-plane sweet spot differs from the
        # tiled-grid default); consumed by _get_sweep when patch_batch is unset
        self._planned_patch_batch = None
        self._sweeps = {}
        # write-behind output state (_submit_write / finalize)
        self._writer = None
        self._write_future = None

    def _mesh_active(self) -> bool:
        # local devices: under multi-host each process predicts its own file
        # shard (get_test_loaders), so the patch grid shards over the LOCAL
        # mesh only — a global mesh would make disjoint per-host volumes into
        # one collective program (deadlock/garbage)
        return self.shard and len(jax.local_devices()) > 1

    def _get_sweep(self, patch_shape, halo_shape, normalize, stats, weighted, spatial_n=0):
        from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow
        from pytorch3dunet_tpu.parallel import data_mesh
        from pytorch3dunet_tpu.parallel.spatial import space_mesh

        spatial_mesh = space_mesh(spatial_n, devices=jax.local_devices()) if spatial_n > 1 else None
        mesh = data_mesh(jax.local_devices()) if (spatial_mesh is None and self._mesh_active()) else None
        # a planned full-plane patch_batch wins even over an explicit config
        # value: the plan already clamps to the stack depth (an explicit 24
        # on a 6-plane volume must not dispatch 18 dead forwards)
        patch_batch = self._planned_patch_batch or self.patch_batch
        if patch_batch is None:
            patch_batch = 16 if is_model_2d(self.model) else 1
        if spatial_mesh is not None:
            patch_batch = 1
        # resolve the weighted tri-state BEFORE keying: weighted=None means
        # "blend decides", and mesh sweeps are always weighted — otherwise a
        # run mixing in-memory and streamed volumes would compile the same
        # sweep twice (a multi-minute cost over the tunneled TPU)
        if weighted is None:
            weighted = self.blend == "gaussian"
        if mesh is not None or spatial_mesh is not None:
            weighted = True
        # the key is purely structural: per-volume stats (global_normalization
        # mean/std) enter the jitted sweep as traced arguments, so every
        # volume reuses ONE compiled program (callers pass stats per call)
        tta_axes = self._tta_patch_axes()
        key = (patch_shape, halo_shape, normalize, self.blend, weighted, patch_batch, tta_axes,
               mesh is not None, spatial_n)
        if key not in self._sweeps:
            if mesh is not None:
                logger.info(f"Sharding the patch grid over {mesh.devices.size} devices")
            if spatial_mesh is not None:
                logger.info(f"Sharding each patch's z-axis over {spatial_n} devices (cooperative)")
            self._sweeps[key] = DeviceSlidingWindow(
                self.model, patch_shape, halo_shape, normalize=normalize, stats=stats,
                blend=self.blend, mesh=mesh, weighted=weighted, patch_batch=patch_batch,
                tta_axes=tta_axes, spatial_mesh=spatial_mesh,
            )
        return self._sweeps[key]

    def _plan_spatial_slab(self, spatial, max_slab_z, grid_patch_shape, halo_shape, normalize,
                           min_slab_z=64):
        """Cooperative arm of `patch_mode: slab` for meshes with more devices
        than slabs: instead of falling back to the patch grid, shard every
        slab's z-axis across ALL local devices (halo-exchanged convs + psum'd
        GroupNorm, parallel/spatial.py) so the slab geometry's halo savings
        and full mesh utilization compose.

        Searches downward from `max_slab_z` for the largest slab depth whose
        PADDED depth stays exactly shardable n_dev ways through the model's
        pooling pyramid. Returns (n_dev, (slab_patch_shape, starts)), or
        (0, None) when no such depth >= the thin-slab floor exists or the
        model/pipeline can't spatially shard (BatchNorm, anisotropic deconv,
        percentile normalization, z-mirror TTA)."""
        from pytorch3dunet_tpu.parallel.spatial import (
            spatial_min_local, spatial_pool_d, spatial_shardable, validate_spatial_model,
        )

        if normalize == "percentile" or 0 in self._tta_patch_axes():
            return 0, None
        try:
            validate_spatial_model(self.model)
        except AssertionError as e:
            logger.info(f"slab z-sharding unavailable for this model: {e}")
            return 0, None
        n = len(jax.local_devices())
        d, h, w = (int(s) for s in spatial)
        hz = halo_shape[0]
        pool, min_local = spatial_pool_d(self.model), spatial_min_local(self.model)
        levels = len(self.model.f_maps)
        floor = max(min_slab_z, grid_patch_shape[0])
        for slab_z in range(min(max_slab_z, d), floor - 1, -1):
            if spatial_shardable(slab_z + 2 * hz, levels, n, pool=pool, min_local=min_local):
                return n, ((slab_z, h, w), _slab_starts(d, slab_z))
        return 0, None

    def _plan_geometry(self, spatial, patch_shape, starts, halo_shape, cin, normalize):
        """Applies `patch_mode` to the configured (patch_shape, starts) grid.

        Returns (patch_shape, starts, spatial_n); spatial_n > 1 means each
        patch's z-axis shards cooperatively over that many devices (slab x
        mesh composition). `patch_mode: grid` returns the inputs unchanged.
        """
        spatial_n = 0
        self._planned_patch_batch = None
        if self.patch_mode != "slab":
            return patch_shape, starts, spatial_n
        n_grid = len(starts)
        if is_model_2d(self.model):
            # full-plane geometry's measured sweet spot is 24 planes per
            # forward (BENCH_NOTES r4: patch_batch 16 -> 100.7, 24 -> 132.8,
            # 32 -> 104.5 Mvox/s on 512x512 planes); tiled 2D grids keep the
            # default 16 (measured best there). An explicit patch_batch wins;
            # otherwise try 24 and step down to 16 if the budget refuses.
            # clamp by the stack depth: a 6-plane volume must not plan
            # patch_batch=24 (the sweep would pad 6 starts to 24 — dead
            # forwards — and the budget check could refuse 24 where 6 fit)
            d = int(spatial[0])
            if self.patch_batch is not None:
                candidates = (min(self.patch_batch, d),)
            else:
                candidates = tuple(dict.fromkeys((min(24, d), min(16, d))))
            plan = None
            for pb in candidates:
                plan = _plan_plane_grid(spatial, halo_shape, cin, self.max_patch_voxels, pb)
                if plan is not None:
                    break
            if plan is None:
                logger.warning(
                    f"patch_mode 'slab': {spatial[1]}x{spatial[2]} planes x patch_batch={pb} "
                    f"exceed max_patch_voxels={self.max_patch_voxels}; keeping the configured grid"
                )
            else:
                patch_shape, starts = plan
                self._planned_patch_batch = pb
                logger.info(
                    f"patch_mode 'slab': {len(starts)} full-plane 2D patches replace the "
                    f"{n_grid}-tile grid (patch_batch={pb})"
                )
            return patch_shape, starts, spatial_n

        plan = _plan_slab_grid(spatial, patch_shape, halo_shape, cin, self.max_patch_voxels)
        n_dev = len(jax.local_devices()) if self._mesh_active() else 1
        if plan is None:
            # slab refused (plane too large / slabs too thin): try the strip
            # geometry before surrendering to the grid — the planner prefers
            # slab > strip > grid automatically
            strip = _plan_strip_grid(spatial, patch_shape, halo_shape, cin, self.max_patch_voxels)
            if strip is not None and (len(strip[1]) >= n_dev or n_dev > n_grid):
                patch_shape, starts = strip
                logger.info(
                    f"patch_mode 'slab': no full-plane slab fits; {len(starts)} "
                    f"{patch_shape[0]}x{patch_shape[1]}x{patch_shape[2]} strips replace the "
                    f"{n_grid}-patch grid (halo only on the short axes)"
                )
                return patch_shape, starts, spatial_n
            if strip is not None:
                logger.info(
                    f"patch_mode 'slab': {len(strip[1])} strips would idle "
                    f"{n_dev - len(strip[1])} of {n_dev} devices; keeping the {n_grid}-patch grid"
                )
            else:
                logger.warning(
                    f"patch_mode 'slab': neither a full-plane slab nor a strip fits "
                    f"max_patch_voxels={self.max_patch_voxels} for the {spatial[1]}x{spatial[2]} "
                    "plane; keeping the configured patch grid"
                )
        elif len(plan[1]) < n_dev:
            # fewer slabs than chips: first try COOPERATIVE sharding — every
            # slab's z-axis splits across the mesh (halo-exchanged convs +
            # psum'd GroupNorm, parallel/spatial.py), so the slab geometry's
            # halo savings AND full mesh utilization compose
            spatial_n, sp_plan = self._plan_spatial_slab(
                spatial, plan[0][0], patch_shape, halo_shape, normalize)
            if spatial_n == n_dev:
                patch_shape, starts = sp_plan
                logger.info(
                    f"patch_mode 'slab': {len(starts)} z-slab(s) of depth {patch_shape[0]}, "
                    f"each z-sharded over all {spatial_n} devices cooperatively"
                )
            elif n_dev <= n_grid:
                # a partially-idle spatial mesh loses to the grid split
                # across ALL chips; keep the grid
                spatial_n = 0
                logger.info(
                    f"patch_mode 'slab': {len(plan[1])} slabs would idle "
                    f"{n_dev - len(plan[1])} of {n_dev} devices and no slab depth is "
                    f"z-shardable {n_dev} ways; keeping the "
                    f"{n_grid}-patch grid (set 'shard: false' to prefer slabs)"
                )
            else:
                # the configured grid is ALSO smaller than the mesh — slabs
                # at least save halo redundancy
                spatial_n = 0
                patch_shape, starts = plan
                logger.info(
                    f"patch_mode 'slab': {len(starts)} z-slab(s) of depth "
                    f"{patch_shape[0]} (grid and slabs both underfill the "
                    f"{n_dev}-device mesh; z-sharding unavailable)"
                )
        else:
            patch_shape, starts = plan
            logger.info(
                f"patch_mode 'slab': {len(starts)} full-plane z-slab(s) of depth "
                f"{patch_shape[0]} replace the {n_grid}-patch grid"
            )
        return patch_shape, starts, spatial_n

    def __call__(self, test_loader):
        from pytorch3dunet_tpu.datasets.utils import mirror_pad
        from pytorch3dunet_tpu.inference_device import detect_device_path

        dataset = test_loader.dataset
        if is_model_2d(self.model):
            patch_z = dataset.raw_slices[0][-3].stop - dataset.raw_slices[0][-3].start
            if patch_z != 1 or dataset.halo_shape[0] != 0:
                logger.warning(
                    "2D model with non-singleton z patches: falling back to the HOST loop "
                    "(~2.7x slower on TPU). Set patch_shape [1, H, W] and halo_shape "
                    "[0, hy, hx] to keep the device sweep."
                )
                return super().__call__(test_loader)

        device_path = detect_device_path(dataset.transformer.phase_config["raw"], dataset.transformer.config_base)
        if device_path is None:
            logger.warning(
                "Transformer pipeline unsupported by the device sweep: falling back to the "
                "HOST loop (~2.7x slower on TPU). Supported test pipelines: Standardize / "
                "Normalize / PercentileNormalizer (non-channelwise) + ToTensor."
            )
            return super().__call__(test_loader)
        normalize, stats = device_path

        logger.info(f"Processing '{dataset.file_path}' with the device-side sweep...")
        start = time.perf_counter()

        # core start positions from the slice grid (spatial part only)
        starts = np.array(
            [[s.start for s in idx[-3:]] for idx in dataset.raw_slices], dtype=np.int32
        )
        patch_shape = tuple(idx.stop - idx.start for idx in dataset.raw_slices[0][-3:])

        import h5py as _h5py

        with _h5py.File(dataset.file_path, "r") as f:
            raw_dset = f[dataset.raw_internal_path]
            channels_first = raw_dset.ndim == 4
            spatial = raw_dset.shape[1:] if channels_first else raw_dset.shape
            cin = raw_dset.shape[0] if channels_first else 1
            # spatial_n > 1: cooperative z-sharding of each patch (slab mode)
            patch_shape, starts, spatial_n = self._plan_geometry(
                spatial, patch_shape, starts, dataset.halo_shape, cin, normalize)

            overlapping = any(
                len(u := np.unique(starts[:, k])) > 1 and np.min(np.diff(u)) < patch_shape[k]
                for k in range(3)
            )
            if overlapping and self.blend == "assign" and self._mesh_active():
                logger.warning(
                    "blend 'assign' with an overlapping grid on a sharded mesh AVERAGES "
                    "overlapping patches (the single-device path write-wins). Use "
                    "'blend: gaussian' for well-defined overlap blending, or 'shard: false' "
                    "for exact reference write-wins stitching."
                )

            padded_spatial = tuple(s + 2 * h for s, h in zip(spatial, dataset.halo_shape))
            n_voxels = int(np.prod(padded_spatial)) * cin

            if self.max_device_voxels and n_voxels > self.max_device_voxels:
                # bigger-than-budget volume: stream z-slabs straight from the
                # file and the finalized planes straight into the output H5 —
                # host memory stays O(slab), never O(volume) (the device-side
                # counterpart of the reference's Lazy dataset + LazyPredictor
                # pairing, hdf5.py:284-335 + unet3d/predictor.py:228-274)
                return self._streamed_predict(
                    dataset, raw_dset, spatial, starts, patch_shape, normalize, stats, start,
                    spatial_n=spatial_n,
                )

            raw = raw_dset[:]
            if channels_first:
                raw = np.moveaxis(raw, 0, -1)
        padded = mirror_pad(np.asarray(raw, dtype=np.float32), dataset.halo_shape) if raw.ndim == 3 else \
            np.stack([mirror_pad(raw[..., c], dataset.halo_shape) for c in range(raw.shape[-1])], axis=-1)

        sweep = self._get_sweep(patch_shape, dataset.halo_shape, normalize, stats, weighted=None,
                                spatial_n=spatial_n)
        stitched = sweep(self.variables, padded, starts, stats=stats)  # (D, H, W, Cout)
        prediction_array = np.moveaxis(stitched, -1, 0)  # (Cout, D, H, W)

        logger.info(f"Finished device inference in {time.perf_counter() - start:.2f} seconds")

        if self.performance_metric is not None or not self.write_behind:
            # the metric consumes the finalized array anyway: save inline
            prediction_array = self._save_output(prediction_array, dataset)
            if self.performance_metric is not None:
                return self._evaluate(prediction_array, dataset)
            return None
        # write-behind: the gzip H5 write runs on a background thread so the
        # next volume's sweep overlaps it (directory jobs spend seconds per
        # volume in gzip; note h5py's global lock serializes the H5 *reads*
        # of the next volume against this write, so the overlap is with the
        # pad/upload/sweep, not the read). finalize() joins the tail write —
        # predict3dunet calls it after the last loader. Host-memory cost:
        # the previous volume's full (Cout, D, H, W) fp32 array stays alive
        # while the next volume is processed (~2x peak RSS for directory
        # jobs); `write_behind: false` restores inline saves.
        self._submit_write(prediction_array, dataset)
        return None

    def _save_output(self, prediction_array, dataset):
        """Applies the output transform (segmentation / channel select) and
        writes the gzip H5; returns the transformed array."""
        if self.save_segmentation:
            prediction_array = self._to_segmentation(prediction_array)
        elif self.prediction_channel is not None:
            prediction_array = prediction_array[self.prediction_channel : self.prediction_channel + 1]

        output_file = _get_output_file(dataset=dataset, output_dir=self.output_dir)
        logger.info(f"Saving predictions to: {output_file}")
        with h5py.File(output_file, "w") as h5_output_file:
            h5_output_file.create_dataset(self.output_dataset, data=prediction_array, compression="gzip")
        return prediction_array

    def _submit_write(self, prediction_array, dataset):
        from concurrent.futures import ThreadPoolExecutor

        # depth-1 queue: at most one volume-sized write buffer is pending, and
        # the previous write's exceptions surface on the very next volume
        # (finalize also retires an idle writer, so create ours after it)
        self.finalize()
        if self._writer is None:
            self._writer = ThreadPoolExecutor(max_workers=1, thread_name_prefix="h5-write-behind")
        future = self._writer.submit(self._save_output, prediction_array, dataset)
        # safety net for callers that never finalize(): the data still lands
        # (non-daemon worker joins at interpreter exit) but the error would be
        # silently swallowed — log it as soon as the write settles
        future.add_done_callback(
            lambda f: logger.error(f"write-behind save failed: {f.exception()}") if f.exception() else None
        )
        self._write_future = future

    def finalize(self):
        """Drains the write-behind output write, re-raising its exception if
        the write failed, and retires the idle writer thread. Call after the
        last volume (predict3dunet does)."""
        future, self._write_future = self._write_future, None
        try:
            if future is not None:
                future.result()
        finally:
            # nothing pending anymore: release the worker thread instead of
            # leaking one idle non-daemon thread per predictor
            if self._write_future is None and self._writer is not None:
                self._writer.shutdown(wait=True)
                self._writer = None

    def predict_array(self, volume: np.ndarray, patch_shape, stride_shape, halo_shape,
                      normalize=None, stats=None) -> np.ndarray:
        """In-memory sliding-window prediction — the serving path (serve.py).

        (D, H, W) or channels-first (C, D, H, W) numpy in, (Cout, D, H, W)
        float32 probabilities out. Shares the file path's geometry planning
        (`patch_mode`, mesh sharding, cooperative slab z-sharding), device
        normalization, blending, and TTA; equal-shape volumes reuse one
        compiled sweep. No H5 round-trip, no dataset object.
        """
        from pytorch3dunet_tpu.datasets.utils import SliceBuilder, mirror_pad

        volume = np.asarray(volume, dtype=np.float32)
        assert volume.ndim in (3, 4), f"expected (D, H, W) or (C, D, H, W), got shape {volume.shape}"
        channels_first = volume.ndim == 4
        spatial = volume.shape[1:] if channels_first else volume.shape
        cin = volume.shape[0] if channels_first else 1
        halo_shape = tuple(int(h) for h in halo_shape)
        slices = SliceBuilder._build_slices(
            np.broadcast_to(np.float32(0), spatial), tuple(patch_shape), tuple(stride_shape))
        starts = np.array([[s.start for s in idx[-3:]] for idx in slices], dtype=np.int32)
        patch_shape = tuple(idx.stop - idx.start for idx in slices[0][-3:])
        patch_shape, starts, spatial_n = self._plan_geometry(
            spatial, patch_shape, starts, halo_shape, cin, normalize)

        padded_voxels = int(np.prod([s + 2 * h for s, h in zip(spatial, halo_shape)])) * cin
        if self.max_device_voxels and padded_voxels > self.max_device_voxels:
            # over-budget volume: the same pipelined z-slab sweep the file
            # path streams through, landing in an in-memory array instead of
            # an H5 dataset (the caller gets the array back anyway)
            out = np.zeros((*spatial, self.out_channels), dtype=np.float32)

            def consume(z, planes):
                out[z : z + planes.shape[0]] = planes

            self._chunked_sweep(volume, starts, patch_shape, halo_shape, normalize, stats,
                                consume, spatial_n=spatial_n)
            return np.moveaxis(out, -1, 0)

        raw = np.moveaxis(volume, 0, -1) if channels_first else volume
        padded = mirror_pad(raw, halo_shape) if raw.ndim == 3 else \
            np.stack([mirror_pad(raw[..., c], halo_shape) for c in range(raw.shape[-1])], axis=-1)
        sweep = self._get_sweep(patch_shape, halo_shape, normalize, stats, weighted=None,
                                spatial_n=spatial_n)
        stitched = sweep(self.variables, padded, starts, stats=stats)  # (D, H, W, Cout)
        return np.moveaxis(stitched, -1, 0)

    def _streamed_predict(self, dataset, raw_dset, spatial, starts, patch_shape, normalize, stats, t_start,
                          spatial_n=0):
        """Z-slab streaming path for volumes over the device budget: input
        slabs are read from the open H5 dataset (never the whole volume), and
        finalized output planes are written straight into a chunked gzip H5
        dataset. Peak host allocation is O(slab), not O(volume)."""
        output_file = _get_output_file(dataset=dataset, output_dir=self.output_dir)
        logger.info(f"Saving predictions to: {output_file} (streamed)")
        with h5py.File(output_file, "w") as out_f:
            if self.save_segmentation:
                dset = out_f.create_dataset(
                    self.output_dataset, shape=spatial, dtype="uint16", chunks=True, compression="gzip"
                )

                def consume(z, planes):
                    dset[z : z + len(planes)] = self._to_segmentation(planes, channel_axis=-1)
            else:
                n_out = 1 if self.prediction_channel is not None else self.out_channels
                dset = out_f.create_dataset(
                    self.output_dataset, shape=(n_out, *spatial), dtype="float32",
                    chunks=True, compression="gzip",
                )

                def consume(z, planes):
                    arr = np.moveaxis(planes, -1, 0)
                    if self.prediction_channel is not None:
                        arr = arr[self.prediction_channel : self.prediction_channel + 1]
                    dset[:, z : z + planes.shape[0]] = arr

            self._chunked_sweep(raw_dset, starts, patch_shape, dataset.halo_shape, normalize, stats, consume,
                                spatial_n=spatial_n)
            logger.info(f"Finished device inference in {time.perf_counter() - t_start:.2f} seconds")

            if self.performance_metric is not None:
                return self._evaluate(dset[...], dataset)
        return None

    def _chunked_sweep(self, raw, starts, patch_shape, halo_shape, normalize, stats, consume, spatial_n=0):
        """Sweeps the grid in z-slabs so only O(slab) data lives on device
        (and on host) at a time — the device-side LazyPredictor analog.

        `raw` is an open h5py dataset (or array), (D, H, W) or (C, D, H, W);
        each slab is read with `_read_padded_slab` (one contiguous H5 read).
        Finalized output planes are emitted in ascending-z order through
        `consume(z_start, planes)` with planes shaped (dz, H, W, Cout).

        The slab loop is a 3-stage software pipeline: a loader thread reads
        and host->device-uploads slab i+1 while the device sweeps slab i, and
        a writer thread runs `consume` (typically a gzip'd H5 write) behind
        both — disk I/O, PCIe/ICI transfer, and MXU compute overlap instead
        of serializing per slab. Two input slabs are device-resident at the
        steady state, so when the plan has more than one slab the per-slab
        input budget is halved (the configured `max_device_voxels` keeps
        bounding the TOTAL device input footprint).

        Stitching semantics match the unchunked sweep: `blend: gaussian`
        accumulates (out, weights) partials in a rolling buffer across slab
        boundaries (bit-equal to the one-shot weighted sweep); `blend: assign`
        stitches write-wins inside each slab and lets later slabs overwrite
        their full z-extent — identical to the reference's write-wins order
        because the patch grid is z-major ascending. With the grid sharded
        over a mesh the sweep returns uniform-weighted partials, which
        accumulate across slabs here exactly like gaussian mode — the global
        overlap average then matches the unchunked sharded sweep.
        """
        import collections
        from concurrent.futures import ThreadPoolExecutor

        weighted = self.blend == "gaussian" or self._mesh_active() or spatial_n > 1
        channels_first = raw.ndim == 4
        depth = int(raw.shape[1] if channels_first else raw.shape[0])
        hz = halo_shape[0]
        cz = patch_shape[0]
        pz = cz + 2 * hz
        plane_voxels = int(np.prod([s + 2 * h for s, h in zip(raw.shape[-2:], halo_shape[1:])]))
        plane_voxels *= raw.shape[0] if channels_first else 1
        z_capacity = max(int(self.max_device_voxels // max(plane_voxels, 1)), pz)

        sweep = self._get_sweep(tuple(patch_shape), tuple(halo_shape), normalize, stats, weighted=weighted,
                                spatial_n=spatial_n)

        # group ascending z-levels into slabs bounded by the device budget
        z_levels = [int(z) for z in np.unique(starts[:, 0])]

        def _group(cap):
            groups: list[list[int]] = [[]]
            for z in z_levels:
                if groups[-1] and (z - groups[-1][0] + pz) > cap:
                    groups.append([])
                groups[-1].append(z)
            return groups

        slabs = _group(z_capacity)
        if len(slabs) > 1:
            # the pipeline keeps the NEXT slab's input device-resident while
            # the current one computes; halve the per-slab budget so the two
            # together still respect max_device_voxels
            z_capacity = max(z_capacity // 2, pz)
            slabs = _group(z_capacity)
        logger.info(f"Streamed sweep: {len(z_levels)} z-levels in {len(slabs)} slabs of <= {z_capacity} z-planes")

        # rolling emit buffer over [ptr, ptr + len(buf)) output z-planes
        hw = tuple(raw.shape[-2:])
        cout = self.out_channels
        buf_out = np.zeros((0, *hw, cout), dtype=np.float32)
        buf_w = np.zeros((0, *hw), dtype=np.float32) if weighted else None
        ptr = 0

        def _load(slab_i):
            """Loader-thread stage: contiguous H5 slab read + host->device
            upload; runs for slab i+1 while the device sweeps slab i."""
            levels = slabs[slab_i]
            sub = _read_padded_slab(raw, halo_shape, levels[0], levels[-1] + pz)
            if sub.ndim == 3:
                sub = sub[..., None]
            return jax.device_put(sub)

        writes: collections.deque = collections.deque()
        with ThreadPoolExecutor(max_workers=1) as loader, ThreadPoolExecutor(max_workers=1) as writer:
            next_slab = loader.submit(_load, 0)
            for slab_i, slab_levels in enumerate(slabs):
                z0, z1 = slab_levels[0], slab_levels[-1]
                sub = next_slab.result()
                if slab_i + 1 < len(slabs):
                    next_slab = loader.submit(_load, slab_i + 1)
                members = np.isin(starts[:, 0], slab_levels)
                local = starts[members].copy()
                local[:, 0] -= z0
                part_out, part_w = sweep.sweep_raw(self.variables, sub, local, stats=stats)
                zo = z1 - z0 + cz  # output extent of the slab

                grow = (z0 + zo) - (ptr + buf_out.shape[0])
                if grow > 0:
                    buf_out = np.concatenate([buf_out, np.zeros((grow, *hw, cout), np.float32)])
                    if weighted:
                        buf_w = np.concatenate([buf_w, np.zeros((grow, *hw), np.float32)])
                lo = z0 - ptr
                if weighted:
                    buf_out[lo : lo + zo] += part_out
                    buf_w[lo : lo + zo] += part_w
                else:
                    # non-mesh assign sweeps return unweighted partials;
                    # overwrite preserves the z-major write-wins order
                    assert part_w is None
                    buf_out[lo : lo + zo] = part_out

                emit_end = slabs[slab_i + 1][0] if slab_i + 1 < len(slabs) else depth
                n_emit = emit_end - ptr
                if n_emit > 0:
                    planes = buf_out[:n_emit]
                    if weighted:
                        planes = planes / np.maximum(buf_w[:n_emit], 1e-10)[..., None]
                    # writer-thread stage: consume() (gzip H5 write) overlaps
                    # the next slab's sweep. In assign mode `planes` views the
                    # emitted [0, n_emit) prefix of buf_out's base; subsequent
                    # slabs only touch base indices >= n_emit (or a fresh base
                    # after concatenate), so the pending write is never
                    # mutated under the writer. Keep at most one write in
                    # flight so host RSS stays O(slab).
                    while len(writes) >= 1:
                        writes.popleft().result()
                    writes.append(writer.submit(consume, ptr, planes))
                    buf_out = buf_out[n_emit:]
                    if weighted:
                        buf_w = buf_w[n_emit:]
                    ptr = emit_end
            while writes:
                writes.popleft().result()


class DSB2018Predictor(AbstractPredictor):
    """Per-image 2D prediction with optional connected-component segmentation
    (reference predictor.py:277-330).

    `pad_to_multiple` (opt-in): reflect-pads each image's H/W up to the next
    multiple before the forward and crops the prediction back. XLA compiles
    one program per input shape — on variable-size DSB images an unpadded run
    recompiles per image (minutes each over a tunneled TPU); bucketing bounds
    the number of compiles. Off by default because padding slightly perturbs
    the GroupNorm statistics (global over the image) vs the reference.
    """

    def __init__(self, model, variables, output_dir, config=None, save_segmentation=True,
                 pmaps_thershold=0.5, pad_to_multiple=None, **kwargs):
        kwargs.setdefault("out_channels", 1)
        super().__init__(model, variables, output_dir, **kwargs)
        self.pmaps_threshold = pmaps_thershold
        self.save_segmentation = save_segmentation
        self.pad_to_multiple = pad_to_multiple

    def __call__(self, test_loader):
        # overlap H5 writes with device compute (reference predictor.py:293-308
        # uses a ProcessPoolExecutor(max_workers=32) for the same reason)
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=32) as executor:
            futures = []
            for img, paths in test_loader:
                pred = self._forward_2d(img)
                futures.append(executor.submit(
                    dsb_save_batch, self.output_dir, paths, pred,
                    save_segmentation=self.save_segmentation,
                    pmaps_thershold=self.pmaps_threshold,
                ))
            for future in futures:
                future.result()  # surface worker exceptions

    def _forward_2d(self, img: np.ndarray) -> np.ndarray:
        if self._forward_fn is None:
            model = self.model

            def fwd(variables, x):
                run = self._tta_wrap(
                    lambda xi: model.module.apply(variables, xi, train=False)[0], two_d=True
                )
                return run(x)

            self._forward_fn = jax.jit(fwd)
        img = np.asarray(img, dtype=np.float32)
        had_depth = img.ndim == 5
        if had_depth:
            # (N, C, 1, H, W) from the singleton-z 2D convention
            img = np.squeeze(img, axis=2)
        inp = np.moveaxis(img, 1, -1)
        h, w = inp.shape[1], inp.shape[2]
        if self.pad_to_multiple:
            m = int(self.pad_to_multiple)
            for axis, pad in ((1, (-h) % m), (2, (-w) % m)):
                if pad:
                    width = [(0, 0)] * inp.ndim
                    width[axis] = (0, pad)
                    # numpy reflect requires pad < dim; tiny images fall back
                    # to edge replication instead of crashing
                    mode = "reflect" if pad < inp.shape[axis] else "edge"
                    inp = np.pad(inp, width, mode=mode)
        probs = np.asarray(self._forward_fn(self.variables, inp))[:, :h, :w, :]
        probs = np.moveaxis(probs, -1, 1)
        if had_depth:
            probs = probs[:, :, None]
        return probs


def dsb_save_batch(output_dir, paths, pred, save_segmentation=True, pmaps_thershold=0.5):
    def _pmaps_to_seg(p):
        mask = p > pmaps_thershold
        return cc_label(mask.astype(np.uint8)).astype("uint16")

    for single_pred, single_path in zip(pred, paths):
        logger.info(f"Processing {single_path}")
        single_pred = single_pred.squeeze()

        out_file = os.path.splitext(single_path)[0] + "_predictions.h5"
        if output_dir is not None:
            out_file = os.path.join(output_dir, os.path.split(out_file)[1])

        with h5py.File(out_file, "w") as f:
            f.create_dataset("predictions", data=single_pred, compression="gzip")
            if save_segmentation:
                f.create_dataset("segmentation", data=_pmaps_to_seg(single_pred), compression="gzip")


def _get_output_file(dataset, suffix: str = "_predictions", output_dir=None) -> Path:
    file_path = Path(dataset.file_path)
    output_dir = file_path.parent if output_dir is None else Path(output_dir)
    return output_dir / (file_path.stem + suffix + ".h5")


def _load_dataset(dataset, internal_path: str) -> np.ndarray:
    with h5py.File(dataset.file_path, "r") as f:
        return f[internal_path][...]


def mean_iou(pred: np.ndarray, gt: np.ndarray, n_classes: int, avg: bool = False):
    """Per-class IoU of a segmentation vs ground truth, skipping background."""
    pred = pred.astype("uint16")
    gt = gt.astype("uint16")
    assert pred.shape == gt.shape, f"Predictions and ground truth have different shapes: {pred.shape} != {gt.shape}"

    per_class_iou = []
    for c in range(1, n_classes):
        intersection = np.logical_and(gt == c, pred == c).sum()
        union = np.logical_or(gt == c, pred == c).sum()
        per_class_iou.append(intersection / union)

    if avg:
        return np.mean(per_class_iou)
    return per_class_iou


def dice_score(pred: np.ndarray, gt: np.ndarray, avg: bool = False):
    """Per-channel Dice of a (C, ...) prediction vs ground truth."""
    pred = pred.astype("uint16")
    gt = gt.astype("uint16")
    assert pred.shape == gt.shape, f"Predictions and ground truth have different shapes: {pred.shape} != {gt.shape}"
    per_class_dice = []
    for c_pred, c_gt in zip(pred, gt):
        intersection = np.logical_and(c_gt, c_pred).sum()
        union = c_gt.sum() + c_pred.sum()
        per_class_dice.append(2 * intersection / union)
    if avg:
        return np.mean(per_class_dice)
    return per_class_dice
