"""Device-side sliding-window predictor tests: parity with the host loop."""

import os

import h5py
import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.datasets.utils import get_test_loaders
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.predict import get_predictor


def _make_config(tmpdir, shape=(24, 72, 72), halo=(4, 8, 8), transformer=None):
    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.RandomState(0).rand(*shape))
    return {
        "device": "cpu",
        "model_path": "",
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                  "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False},
        "predictor": {"name": "StandardPredictor"},
        "loaders": {
            "output_dir": str(tmpdir),
            "batch_size": 1,
            "raw_internal_path": "raw",
            "num_workers": 1,
            "test": {
                "file_paths": [path],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 24, 24],
                                  "stride_shape": [8, 24, 24], "halo_shape": list(halo),
                                  "skip_shape_check": True},
                "transformer": {"raw": transformer or [{"name": "Standardize"},
                                                       {"name": "ToTensor", "expand_dims": True}]},
            },
        },
    }


def _predict(config, model, variables):
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    out = os.path.join(config["loaders"]["output_dir"], "vol_predictions.h5")
    with h5py.File(out, "r") as f:
        return f["predictions"][:]


@pytest.mark.parametrize("halo", [(4, 8, 8), (0, 0, 0)])
def test_device_matches_host(tmpdir, halo):
    config = _make_config(tmpdir, halo=halo)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    host = _predict(config, model, variables)
    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    device = _predict(config, model, variables)

    assert device.shape == host.shape
    np.testing.assert_allclose(device, host, atol=2e-5)


def test_gaussian_blend_no_overlap_matches_assign(tmpdir):
    # with stride == patch there is no overlap: blending must equal assignment
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    assign = _predict(config, model, variables)
    config["predictor"]["blend"] = "gaussian"
    blended = _predict(config, model, variables)
    np.testing.assert_allclose(blended, assign, atol=1e-4)


def test_gaussian_blend_overlapping(tmpdir):
    # overlapping grid: blending must produce valid probabilities everywhere
    config = _make_config(tmpdir)
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [4, 12, 12]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    config["predictor"]["blend"] = "gaussian"
    out = _predict(config, model, variables)
    np.testing.assert_allclose(out.sum(axis=0), 1.0, atol=1e-3)  # softmax volumes blend to 1


def test_sharded_grid_matches_single_device(tmpdir):
    # the patch grid is split across the 8 virtual devices; the psum-merged
    # output must be identical to the single-device sweep
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    single = _predict(config, model, variables)

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": True}
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    # the sweep actually ran sharded over the full device mesh
    assert any(k[-2] for k in predictor._sweeps), "sharded sweep was not used"
    sweep = next(iter(predictor._sweeps.values()))
    assert sweep.mesh is not None and sweep.mesh.devices.size == len(jax.devices())

    out = os.path.join(config["loaders"]["output_dir"], "vol_predictions.h5")
    with h5py.File(out, "r") as f:
        sharded = f["predictions"][:]
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_sharded_gaussian_overlapping(tmpdir):
    # sharded + gaussian blending on an overlapping grid: valid probabilities
    config = _make_config(tmpdir)
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [4, 12, 12]
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "blend": "gaussian", "shard": True}
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    out = _predict(config, model, variables)
    np.testing.assert_allclose(out.sum(axis=0), 1.0, atol=1e-3)


def test_chunked_sweep_matches_full_upload(tmpdir):
    # force z-slab chunking with a tiny device budget: identical output
    config = _make_config(tmpdir, shape=(32, 48, 48))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 24, 24]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    full = _predict(config, model, variables)

    # one slab holds at most ~2 patch rows of z-planes
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False,
                           "max_device_voxels": 2 * 16 * 64 * 64}
    chunked = _predict(config, model, variables)
    np.testing.assert_allclose(chunked, full, atol=2e-5)


def test_chunked_gaussian_overlapping_matches_full(tmpdir):
    # overlapping grid + gaussian blending: the rolling-buffer slab stitching
    # must accumulate across slab boundaries exactly like the one-shot sweep
    config = _make_config(tmpdir, shape=(32, 48, 48))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [4, 12, 12]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False, "blend": "gaussian"}
    full = _predict(config, model, variables)
    config["predictor"]["max_device_voxels"] = 2 * 16 * 64 * 64
    chunked = _predict(config, model, variables)
    np.testing.assert_allclose(chunked, full, atol=2e-5)


def test_chunked_assign_overlapping_matches_full(tmpdir):
    # overlapping grid + assign: chunked stitching preserves the reference's
    # write-wins order (later slabs overwrite their full z-extent)
    config = _make_config(tmpdir, shape=(32, 48, 48))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [4, 12, 12]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False, "blend": "assign"}
    full = _predict(config, model, variables)
    config["predictor"]["max_device_voxels"] = 2 * 16 * 64 * 64
    chunked = _predict(config, model, variables)
    np.testing.assert_allclose(chunked, full, atol=2e-5)


def test_chunked_sharded_assign_overlapping_matches_full(tmpdir):
    # grid sharded over the mesh + assign + overlap + chunking: partials must
    # accumulate ACROSS slabs so cross-slab overlaps average exactly like the
    # unchunked sharded sweep (overwriting would drop earlier-slab weights)
    config = _make_config(tmpdir, shape=(32, 48, 48))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [4, 12, 12]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": True, "blend": "assign"}
    full = _predict(config, model, variables)
    config["predictor"]["max_device_voxels"] = 2 * 16 * 64 * 64
    chunked = _predict(config, model, variables)
    np.testing.assert_allclose(chunked, full, atol=2e-5)


def test_read_padded_slab_matches_mirror_pad():
    from pytorch3dunet_tpu.datasets.utils import mirror_pad
    from pytorch3dunet_tpu.predictor import _read_padded_slab

    rs = np.random.RandomState(3)
    halo = (4, 3, 2)
    vol = rs.rand(20, 16, 12).astype(np.float32)
    padded = mirror_pad(vol, halo)
    for z_lo, z_hi in [(0, 9), (5, 17), (13, 28)]:
        slab = _read_padded_slab(vol, halo, z_lo, z_hi)
        np.testing.assert_array_equal(slab, padded[z_lo:z_hi])

    # channels-first 4D volume
    vol4 = rs.rand(2, 20, 16, 12).astype(np.float32)
    padded4 = np.stack([mirror_pad(vol4[c], halo) for c in range(2)], axis=-1)
    slab4 = _read_padded_slab(vol4, halo, 3, 19)
    np.testing.assert_array_equal(slab4, padded4[3:19])


def test_streamed_sweep_reads_and_emits_o_slab(tmpdir):
    """Bigger-than-budget volumes never materialize on host: every H5 read is
    slab-sized and output planes stream out in contiguous ascending order."""
    from pytorch3dunet_tpu.predict import get_predictor

    config = _make_config(tmpdir, shape=(64, 48, 48))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 24, 24]
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False,
                           "max_device_voxels": 2 * 16 * 64 * 64}
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)

    class RecordingRaw:
        """h5py-dataset stand-in that records the z-extent of every read."""

        def __init__(self, arr):
            self.arr = arr
            self.ndim = arr.ndim
            self.shape = arr.shape
            self.max_z_read = 0

        def __getitem__(self, key):
            zs = key if isinstance(key, slice) else key[0] if isinstance(key, tuple) else key
            if isinstance(zs, slice):
                lo = zs.start or 0
                hi = self.shape[0] if zs.stop is None else zs.stop
                self.max_z_read = max(self.max_z_read, hi - lo)
            else:
                self.max_z_read = self.shape[0]  # full read
            return self.arr[key]

    raw = RecordingRaw(np.random.RandomState(1).rand(64, 48, 48).astype(np.float32))
    starts = np.array([[z, y, x] for z in range(0, 57, 8) for y in range(0, 25, 24)
                       for x in range(0, 25, 24)], dtype=np.int32)
    emitted = []
    predictor._chunked_sweep(raw, starts, (8, 24, 24), (4, 8, 8), None, {},
                             lambda z, planes: emitted.append((z, planes.shape[0])))

    # reads stay O(slab): the z-capacity for this budget is 28 planes + halo
    assert raw.max_z_read < 40, raw.max_z_read
    # emission is a contiguous ascending partition of [0, 64)
    pos = 0
    for z, n in emitted:
        assert z == pos
        pos += n
    assert pos == 64


def test_device_percentile_normalizer(tmpdir):
    # PercentileNormalizer runs on device and matches the host pipeline
    config = _make_config(tmpdir, transformer=[{"name": "PercentileNormalizer"},
                                               {"name": "ToTensor", "expand_dims": True}])
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    host = _predict(config, model, variables)

    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    device = _predict(config, model, variables)
    np.testing.assert_allclose(device, host, atol=2e-4)


def test_tpu_device_routes_to_device_sweep(tmpdir):
    # StandardPredictor on a tpu device maps to the device sweep by default
    from pytorch3dunet_tpu.predictor import DeviceSlidingWindowPredictor, StandardPredictor

    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["device"] = "tpu"
    predictor = get_predictor(model, variables, config)
    assert isinstance(predictor, DeviceSlidingWindowPredictor)

    config["predictor"] = {"name": "StandardPredictor", "force_host": True}
    predictor = get_predictor(model, variables, config)
    assert type(predictor) is StandardPredictor

    config["device"] = "cpu"
    config["predictor"] = {"name": "StandardPredictor"}
    predictor = get_predictor(model, variables, config)
    assert type(predictor) is StandardPredictor


@pytest.mark.parametrize("blend", ["assign", "gaussian"])
def test_batched_sweep_matches_unbatched(tmpdir, blend):
    # patch_batch=3 does not divide the 27-patch grid: exercises the padding
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "blend": blend, "shard": False}
    single = _predict(config, model, variables)
    config["predictor"]["patch_batch"] = 3
    batched = _predict(config, model, variables)
    np.testing.assert_allclose(batched, single, atol=2e-5)


def test_batched_sharded_sweep_matches_unbatched(tmpdir):
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    single = _predict(config, model, variables)
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": True, "patch_batch": 2}
    batched = _predict(config, model, variables)
    np.testing.assert_allclose(batched, single, atol=2e-5)


def test_device_sweep_2d_model_matches_host(tmpdir):
    # 2D models run the device sweep too: singleton-z patches, z as batch
    config = _make_config(tmpdir, shape=(6, 48, 48), halo=(0, 8, 8))
    config["model"] = {"name": "UNet2D", "in_channels": 1, "out_channels": 2,
                       "layer_order": "gcr", "f_maps": 8, "num_groups": 4,
                       "num_levels": 2, "final_sigmoid": False}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [1, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [1, 24, 24]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    host = _predict(config, model, variables)

    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    assert predictor._sweeps, "2D model did not use the device sweep"
    out = os.path.join(config["loaders"]["output_dir"], "vol_predictions.h5")
    with h5py.File(out, "r") as f:
        device = f["predictions"][:]

    assert device.shape == host.shape
    np.testing.assert_allclose(device, host, atol=2e-5)


def test_per_volume_stats_reuse_one_compiled_sweep():
    # global_normalization stats are traced args: distinct per-volume values
    # must NOT trigger a recompile (minutes each over a tunneled TPU)
    from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                       "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False})
    variables = model.init(jax.random.PRNGKey(0))
    sweep = DeviceSlidingWindow(model, patch_shape=(8, 24, 24), halo_shape=(0, 0, 0),
                                normalize="standardize")
    vol = np.random.RandomState(0).rand(8, 24, 24).astype(np.float32)
    starts = np.zeros((1, 3), np.int32)

    before = DeviceSlidingWindow._sweep._cache_size()
    a = sweep(variables, vol, starts, stats={"mean": 0.5, "std": 0.3})
    b = sweep(variables, vol * 50, starts, stats={"mean": 25.0, "std": 15.0})
    after = DeviceSlidingWindow._sweep._cache_size()
    assert after - before == 1, f"stats changed the compiled program: {before} -> {after}"
    # scaled volume + matching stats normalize to (nearly) the same input
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_device_per_patch_standardize(tmpdir):
    # per-patch Standardize (no global stats) is supported on device
    config = _make_config(tmpdir)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    host = _predict(config, model, variables)

    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    device = _predict(config, model, variables)
    np.testing.assert_allclose(device, host, atol=2e-5)


def test_multichannel_raw_device_and_streamed(tmpdir):
    # 4D (C, D, H, W) raw volumes: channels ride the sweep (moved last); the
    # streamed path must produce the identical prediction
    config = _make_config(tmpdir, shape=(32, 48, 48))
    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:  # truncates the 3D fixture
        f.create_dataset("raw", data=np.random.RandomState(5).rand(2, 32, 48, 48))
    config["model"]["in_channels"] = 2
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 24, 24]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    full = _predict(config, model, variables)
    assert full.shape == (2, 32, 48, 48)

    config["predictor"]["max_device_voxels"] = 2 * 16 * 64 * 64
    streamed = _predict(config, model, variables)
    np.testing.assert_allclose(streamed, full, atol=2e-5)

    # and the host loop agrees with the device sweep
    config["predictor"] = {"name": "StandardPredictor"}
    host = _predict(config, model, variables)
    np.testing.assert_allclose(full, host, atol=2e-5)


def test_slab_plan_geometry():
    # unit coverage of the patch_mode 'slab' planner
    from pytorch3dunet_tpu.predictor import _plan_slab_grid

    # whole volume fits: one slab, regardless of min_slab_z
    patch, starts = _plan_slab_grid((8, 16, 16), (4, 8, 8), (2, 2, 2), 1, budget=2**24)
    assert patch == (8, 16, 16)
    np.testing.assert_array_equal(starts, [[0, 0, 0]])

    # budget-limited slab depth with a flush tail slab
    # plane = (32+4)*(32+4) = 1296; budget 1296*74 -> slab_z = 74 - 4 = 70
    patch, starts = _plan_slab_grid((100, 32, 32), (16, 16, 16), (2, 2, 2), 1, budget=1296 * 74)
    assert patch == (70, 32, 32)
    np.testing.assert_array_equal(starts, [[0, 0, 0], [30, 0, 0]])

    # slabs thinner than min_slab_z (and the configured patch depth) are a
    # measured LOSS (BENCH_NOTES r4): keep the user's grid instead
    assert _plan_slab_grid((100, 32, 32), (16, 16, 16), (2, 2, 2), 1, budget=1296 * 40) is None
    # plane alone blows the budget
    assert _plan_slab_grid((100, 512, 512), (16, 64, 64), (2, 2, 2), 1, budget=10000) is None


def test_strip_plan_geometry():
    # unit coverage of the strip planner (slab > strip > grid fallback)
    from pytorch3dunet_tpu.predictor import _plan_slab_grid, _plan_strip_grid

    spatial, patch, halo = (100, 96, 512), (16, 32, 32), (2, 2, 2)
    budget = 2**21
    # the xy plane alone exceeds this budget: no slab can form...
    assert _plan_slab_grid(spatial, patch, halo, 1, budget=budget) is None
    # ...but strips do: one spatial axis spans the full volume
    shape, starts = _plan_strip_grid(spatial, patch, halo, 1, budget=budget)
    sz, sy, sx = shape
    assert sy == 96 or sx == 512, shape  # a full axis
    # the padded strip respects the budget
    assert (sz + 4) * (sy + 4) * (sx + 4) <= budget
    # no strip axis thinner than the floor
    assert sz >= 64 and sy >= 64 and sx >= 64
    # flush-tail coverage is complete
    cover = np.zeros(spatial, dtype=bool)
    for z, y, x in starts:
        assert z + sz <= 100 and y + sy <= 96 and x + sx <= 512, (z, y, x)
        cover[z : z + sz, y : y + sy, x : x + sx] = True
    assert cover.all()

    # nothing >= the 64-voxel floor fits: no strip either
    assert _plan_strip_grid((100, 512, 512), (16, 64, 64), (2, 2, 2), 1, budget=10000) is None


def test_strip_mode_matches_explicit_grid(tmpdir, caplog):
    # when the plane exceeds the budget, patch_mode 'slab' degrades to strips
    # whose output must EXACTLY equal the explicit strip-shaped patch config
    import logging

    config = _make_config(tmpdir, shape=(8, 160, 96), halo=(2, 2, 2))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 64, 64]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 64, 64]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    # budget 100000: slab_z = 100000 // (164*100) - 4 = 2 < 8 -> slab refused;
    # full-x strips (8, 79, 96) fit ((12*83*100 = 99600) <= budget)
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab",
                           "max_patch_voxels": 100000, "shard": False}
    with caplog.at_level(logging.INFO):
        strip = _predict(config, model, variables)
    assert any("strips replace" in r.message for r in caplog.records)

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 79, 96]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 79, 96]
    explicit = _predict(config, model, variables)
    np.testing.assert_allclose(strip, explicit, atol=1e-6)


def test_slab_mode_matches_explicit_big_patch(tmpdir):
    # patch_mode 'slab' must produce EXACTLY the geometry an explicit
    # whole-plane patch config produces: same sweep, same output
    config = _make_config(tmpdir)  # volume 24x72x72, grid 8x24x24, halo (4,8,8)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab", "shard": False}
    slab = _predict(config, model, variables)

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "shard": False}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [24, 72, 72]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [24, 72, 72]
    explicit = _predict(config, model, variables)

    np.testing.assert_allclose(slab, explicit, atol=1e-6)


def test_slab_mode_yields_to_mesh_utilization(tmpdir, caplog):
    # on a sharded mesh, fewer slabs than devices would idle chips: the
    # planner keeps the grid (and says so); the output is the plain grid's
    import logging

    config = _make_config(tmpdir)  # 27-patch grid, 8 virtual devices
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab"}
    with caplog.at_level(logging.INFO):
        slab_sharded = _predict(config, model, variables)
    assert any("would idle" in r.message for r in caplog.records)

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor"}
    grid = _predict(config, model, variables)
    np.testing.assert_allclose(slab_sharded, grid, atol=1e-6)


@pytest.mark.parametrize("blend", ["assign", "gaussian"])
def test_slab_mode_overlapping_tail_and_streaming(tmpdir, blend):
    # depth 80 with a budget for 64-deep slabs -> two slabs overlapping by 48;
    # must equal the explicit-grid equivalent, in memory AND streamed
    config = _make_config(tmpdir, shape=(80, 16, 16), halo=(2, 2, 2))
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [8, 16, 16]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 16, 16]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    # plane = (16+4)^2 = 400; slab_z = budget//400 - 4 = 64
    slab_pred = {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab",
                 "max_patch_voxels": 400 * 68, "blend": blend, "shard": False}
    config["predictor"] = dict(slab_pred)
    slab = _predict(config, model, variables)

    config["predictor"] = dict(slab_pred, max_device_voxels=30000)  # force z-slab streaming
    streamed = _predict(config, model, variables)
    np.testing.assert_allclose(streamed, slab, atol=2e-5)

    # the explicit-grid equivalent: patch 64 deep, stride 16 -> starts [0, 16]
    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "blend": blend, "shard": False}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [64, 16, 16]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [16, 16, 16]
    explicit = _predict(config, model, variables)
    np.testing.assert_allclose(slab, explicit, atol=2e-5)


def test_slab_mode_2d_full_plane(tmpdir):
    # 2D arm of patch_mode 'slab': full-plane singleton-z patches must equal
    # the explicit full-plane tile config; tiny budgets keep the tile grid
    config = _make_config(tmpdir, shape=(6, 48, 48), halo=(0, 8, 8))
    config["model"] = {"name": "UNet2D", "in_channels": 1, "out_channels": 2,
                       "layer_order": "gcr", "f_maps": 8, "num_groups": 4,
                       "num_levels": 2, "final_sigmoid": False}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [1, 24, 24]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [1, 24, 24]
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "patch_mode": "slab",
                           "patch_batch": 2}
    slab = _predict(config, model, variables)

    config["predictor"] = {"name": "DeviceSlidingWindowPredictor", "patch_batch": 2}
    config["loaders"]["test"]["slice_builder"]["patch_shape"] = [1, 48, 48]
    config["loaders"]["test"]["slice_builder"]["stride_shape"] = [1, 48, 48]
    explicit = _predict(config, model, variables)
    np.testing.assert_allclose(slab, explicit, atol=1e-6)

    # over-budget plane: plan refuses, the configured grid sweeps unchanged
    from pytorch3dunet_tpu.predictor import _plan_plane_grid
    assert _plan_plane_grid((6, 48, 48), (0, 8, 8), 1, budget=1000, patch_batch=2) is None


def test_slab_mode_2d_plane_patch_batch_default(tmpdir):
    # unset patch_batch under the full-plane plan defaults to 24 (the
    # measured full-plane sweet spot, BENCH_NOTES r4), steps down to 16 when
    # 24 planes overflow max_patch_voxels, and an explicit value always wins
    from pytorch3dunet_tpu.predictor import DeviceSlidingWindowPredictor

    model = get_model({"name": "UNet2D", "in_channels": 1, "out_channels": 2,
                       "layer_order": "gcr", "f_maps": 8, "num_groups": 4,
                       "num_levels": 2, "final_sigmoid": False})
    plane = 64 * 64  # (0,0,0) halo keeps the padded plane = the plane

    def plan(depth=40, **kw):
        p = DeviceSlidingWindowPredictor(
            model, None, str(tmpdir), out_channels=2, patch_mode="slab", **kw)
        shape, starts, _ = p._plan_geometry(
            (depth, 64, 64), (1, 32, 32), np.zeros((4, 3), np.int32), (0, 0, 0), 1, None)
        return p, shape, starts

    p, shape, starts = plan(max_patch_voxels=24 * plane)
    assert shape == (1, 64, 64) and len(starts) == 40
    assert p._planned_patch_batch == 24

    p, shape, _ = plan(max_patch_voxels=16 * plane)  # 24 refused, 16 fits
    assert shape == (1, 64, 64)
    assert p._planned_patch_batch == 16

    p, shape, _ = plan(max_patch_voxels=24 * plane, patch_batch=8)
    assert shape == (1, 64, 64)
    assert p._planned_patch_batch == 8 and p.patch_batch == 8

    # budget below even 16 planes: the configured grid is kept untouched
    p, shape, starts = plan(max_patch_voxels=8 * plane)
    assert shape == (1, 32, 32) and len(starts) == 4
    assert p._planned_patch_batch is None

    # the stack depth clamps the plan: a 6-plane volume must not dispatch
    # 24-way forwards (18 dead) nor let the budget refuse 24 where 6 fit —
    # and an explicit patch_batch larger than the stack clamps too
    p, shape, starts = plan(depth=6, max_patch_voxels=24 * plane)
    assert shape == (1, 64, 64) and len(starts) == 6
    assert p._planned_patch_batch == 6

    p, shape, _ = plan(depth=6, max_patch_voxels=8 * plane)  # 6 fits under 8
    assert shape == (1, 64, 64)
    assert p._planned_patch_batch == 6

    p, shape, _ = plan(depth=6, max_patch_voxels=24 * plane, patch_batch=16)
    assert shape == (1, 64, 64)
    assert p._planned_patch_batch == 6


def test_write_behind_multi_volume(tmpdir):
    # write-behind saves: a two-volume job overlaps each volume's gzip write
    # with the next volume's work; finalize() drains the tail and every
    # output matches the host predictor's inline save
    config = _make_config(tmpdir)
    path_b = os.path.join(str(tmpdir), "volb.h5")
    with h5py.File(path_b, "w") as f:
        f.create_dataset("raw", data=np.random.RandomState(7).rand(24, 72, 72))
    config["loaders"]["test"]["file_paths"].append(path_b)
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))

    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
    predictor.finalize()
    host = {}
    config["predictor"]["name"] = "StandardPredictor"
    hp = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        hp(loader)
    for stem in ("vol", "volb"):
        out = os.path.join(str(tmpdir), f"{stem}_predictions.h5")
        with h5py.File(out, "r") as f:
            host[stem] = f["predictions"][:]
    # rerun the device job to fresh outputs and compare
    config["predictor"]["name"] = "DeviceSlidingWindowPredictor"
    out_dir = os.path.join(str(tmpdir), "dev")
    os.makedirs(out_dir)
    config["loaders"]["output_dir"] = out_dir
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
    predictor.finalize()
    for stem in ("vol", "volb"):
        with h5py.File(os.path.join(out_dir, f"{stem}_predictions.h5"), "r") as f:
            np.testing.assert_allclose(f["predictions"][:], host[stem], atol=2e-5)


def test_write_behind_error_surfaces_on_finalize(tmpdir):
    # a failed background write must re-raise, not vanish in the thread
    from pytorch3dunet_tpu.predictor import DeviceSlidingWindowPredictor

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 2,
                       "layer_order": "gcr", "f_maps": 8, "num_groups": 4,
                       "num_levels": 2, "final_sigmoid": False})
    p = DeviceSlidingWindowPredictor(model, None, str(tmpdir), out_channels=2)
    boom = RuntimeError("disk full")

    def failing_save(arr, ds):
        raise boom

    p._save_output = failing_save
    p._submit_write(np.zeros((2, 4, 4, 4), np.float32), None)
    with pytest.raises(RuntimeError, match="disk full"):
        p.finalize()
    # the queue is drained: a second finalize is a no-op
    p.finalize()
