"""serve3dunet tests: the online HTTP path must equal batch prediction."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import h5py
import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.serve import ServingSession, make_server

MODEL = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
         "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}
SLICE_BUILDER = {"name": "SliceBuilder", "patch_shape": [8, 24, 24], "stride_shape": [8, 24, 24],
                 "halo_shape": [4, 8, 8], "skip_shape_check": True}
TRANSFORMER = {"raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}]}


def _serve_config():
    return {
        "device": "cpu",
        "model": dict(MODEL),
        "predictor": {"name": "DeviceSlidingWindowPredictor", "shard": False},
        "loaders": {"test": {"slice_builder": dict(SLICE_BUILDER),
                             "transformer": {"raw": [dict(t) for t in TRANSFORMER["raw"]]}}},
    }


@pytest.fixture(scope="module")
def server():
    session = ServingSession(_serve_config())
    srv = make_server(session, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", session
    srv.shutdown()
    thread.join(timeout=10)


def _post_volume(base, vol, query=""):
    buf = io.BytesIO()
    np.save(buf, vol)
    req = urllib.request.Request(f"{base}/predict{query}", data=buf.getvalue(), method="POST",
                                 headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def test_serve_matches_batch_predict(tmpdir, server):
    """A volume POSTed to the server gets the SAME prediction the batch CLI
    path (DeviceSlidingWindowPredictor over an H5 file) writes for it."""
    from pytorch3dunet_tpu.datasets.utils import get_test_loaders
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.predict import get_predictor

    base, session = server
    vol = np.random.RandomState(3).rand(16, 48, 48).astype(np.float32)

    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=vol)
    config = _serve_config()
    config["loaders"].update({"output_dir": str(tmpdir), "batch_size": 1,
                              "raw_internal_path": "raw", "num_workers": 1})
    config["loaders"]["test"]["file_paths"] = [path]
    # the session's weights come from jit(model.init)(PRNGKey(0)); mirror that
    model = get_model(config["model"])
    variables = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    with h5py.File(os.path.join(str(tmpdir), "vol_predictions.h5"), "r") as f:
        batch_pred = f["predictions"][:]

    served = _post_volume(base, vol)
    assert served.shape == batch_pred.shape
    np.testing.assert_allclose(served, batch_pred, atol=2e-5)

    seg = _post_volume(base, vol, query="?output=segmentation")
    assert seg.dtype == np.uint16
    np.testing.assert_array_equal(seg, np.argmax(batch_pred, axis=0).astype(np.uint16))


def test_serve_healthz_info_and_errors(server):
    base, session = server
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
        assert json.loads(resp.read()) == {"status": "ok"}
    with urllib.request.urlopen(f"{base}/info", timeout=30) as resp:
        info = json.loads(resp.read())
    assert info["patch_shape"] == SLICE_BUILDER["patch_shape"]
    assert info["normalize"] == "standardize_patch"
    assert info["predictor"]["patch_mode"] == "grid"

    # malformed body -> 400 with a JSON error
    req = urllib.request.Request(f"{base}/predict", data=b"not numpy", method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    assert "error" in json.loads(err.value.read())

    # wrong rank -> 400
    buf = io.BytesIO()
    np.save(buf, np.zeros((4, 4), np.float32))
    req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400

    # unknown route -> 404
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert err.value.code == 404


def test_serve_pad_to_multiple():
    """Bucketed serving: an off-multiple volume reflect-pads up to the bucket,
    predicts, and crops back to the request shape."""
    session = ServingSession(_serve_config(), pad_to_multiple=(8, 24, 24))
    vol = np.random.RandomState(5).rand(11, 30, 40).astype(np.float32)
    pred = session.predict(vol)
    assert pred.shape == (2, 11, 30, 40)
    assert np.isfinite(pred).all()


def test_serve_rejects_host_only_transformer():
    config = _serve_config()
    config["loaders"]["test"]["transformer"]["raw"] = [
        {"name": "Standardize", "channelwise": True}, {"name": "ToTensor", "expand_dims": True}]
    with pytest.raises(ValueError, match="not supported by the device sweep"):
        ServingSession(config)


def test_serve_global_normalization_matches_batch(tmpdir):
    """loaders.global_normalization: serving computes whole-volume mean/std
    per request — must equal the batch path's dataset-computed statistics."""
    from pytorch3dunet_tpu.datasets.utils import get_test_loaders
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.predict import get_predictor

    vol = np.random.RandomState(7).rand(16, 48, 48).astype(np.float32) * 3 + 5
    path = os.path.join(str(tmpdir), "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=vol)

    config = _serve_config()
    config["loaders"]["global_normalization"] = True
    config["loaders"].update({"output_dir": str(tmpdir), "batch_size": 1,
                              "raw_internal_path": "raw", "num_workers": 1})
    config["loaders"]["test"]["file_paths"] = [path]

    model = get_model(config["model"])
    variables = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()
    with h5py.File(os.path.join(str(tmpdir), "vol_predictions.h5"), "r") as f:
        batch_pred = f["predictions"][:]

    session = ServingSession(_serve_config() | {"loaders": config["loaders"]})
    assert session.normalize == "standardize"
    served = session.predict(vol)
    np.testing.assert_allclose(served, batch_pred, atol=2e-5)


def test_predict_array_streams_over_budget_volumes(tmpdir):
    """predict_array must route volumes over max_device_voxels through the
    pipelined z-slab stream (same output, bounded device footprint)."""
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.predict import get_predictor

    vol = np.random.RandomState(9).rand(32, 48, 48).astype(np.float32)
    config = _serve_config()
    config["loaders"].update({"output_dir": str(tmpdir), "batch_size": 1,
                              "raw_internal_path": "raw", "num_workers": 1})
    model = get_model(config["model"])
    variables = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))

    predictor = get_predictor(model, variables, config)
    full = predictor.predict_array(vol, (8, 24, 24), (8, 24, 24), (4, 8, 8),
                                   normalize="standardize_patch", stats={})

    config["predictor"]["max_device_voxels"] = 16 * 64 * 64
    streamed_predictor = get_predictor(model, variables, config)
    streamed = streamed_predictor.predict_array(vol, (8, 24, 24), (8, 24, 24), (4, 8, 8),
                                                normalize="standardize_patch", stats={})
    np.testing.assert_allclose(streamed, full, atol=2e-5)


def _start_server(session):
    srv = make_server(session, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_serve_request_size_limit():
    """Content-Length over max_request_bytes -> 413 BEFORE the body is read."""
    session = ServingSession(_serve_config(), max_request_bytes=1024)
    srv, base = _start_server(session)
    try:
        buf = io.BytesIO()
        np.save(buf, np.zeros((8, 24, 24), np.float32))
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 413
        assert "exceeds" in json.loads(err.value.read())["error"]
    finally:
        srv.shutdown()


def test_serve_bearer_token_auth():
    """With a token configured: /healthz stays open, everything else 401s
    without `Authorization: Bearer <token>` and works with it."""
    session = ServingSession(_serve_config(), token="s3cret")
    srv, base = _start_server(session)
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            assert json.loads(resp.read()) == {"status": "ok"}

        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f"{base}/info", timeout=30)
        assert err.value.code == 401
        assert err.value.headers.get("WWW-Authenticate", "").startswith("Bearer")

        buf = io.BytesIO()
        np.save(buf, np.zeros((8, 24, 24), np.float32))
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(), method="POST",
                                     headers={"Authorization": "Bearer wrong"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 401

        hdr = {"Authorization": "Bearer s3cret"}
        with urllib.request.urlopen(
                urllib.request.Request(f"{base}/info", headers=hdr), timeout=30) as resp:
            assert json.loads(resp.read())["auth"] is True
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(), method="POST", headers=hdr)
        with urllib.request.urlopen(req, timeout=300) as resp:
            pred = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        assert pred.shape == (2, 8, 24, 24)
    finally:
        srv.shutdown()


def _serve_2d_config(global_norm=False):
    cfg = {
        "device": "cpu",
        "model": {"name": "UNet2D", "in_channels": 1, "out_channels": 1, "layer_order": "gcr",
                  "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True},
        "predictor": {"name": "DeviceSlidingWindowPredictor", "shard": False},
        "loaders": {"test": {"slice_builder": {"name": "SliceBuilder", "patch_shape": [1, 24, 24],
                                               "stride_shape": [1, 24, 24], "halo_shape": [0, 4, 4],
                                               "skip_shape_check": True},
                             "transformer": {"raw": [{"name": "Standardize"},
                                                     {"name": "ToTensor", "expand_dims": True}]}}},
    }
    if global_norm:
        cfg["loaders"]["global_normalization"] = True
    return cfg


@pytest.mark.parametrize("global_norm", [False, True])
def test_serve_2d_microbatching_matches_direct(global_norm):
    """Concurrent 2D requests coalesce into ONE bucket-padded dispatch whose
    per-request outputs equal the unbatched path (per-patch stats batch
    directly; volume-level stats host-apply + device normalize='none')."""
    import time

    session = ServingSession(_serve_2d_config(global_norm), batch_planes=8)
    assert session._batcher is not None
    rng = np.random.RandomState(11)
    vols = [rng.rand(d, 24, 24).astype(np.float32) * 2 + 1 for d in (2, 3, 2)]
    expected = [session._predict_direct(v, session._resolve_stats(v)) for v in vols]

    # hold the device lock: the worker blocks on its first (singleton) item
    # while the rest queue up, so the follow-up batch is deterministic
    with session._lock:
        futures = [session._batcher.submit(v, session._resolve_stats(v)) for v in vols]
        time.sleep(0.3)
    results = [f.result(timeout=600) for f in futures]

    assert session._batcher.batched_dispatches >= 1
    assert session._batcher.batched_requests >= 2
    for got, want in zip(results, expected):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_serve_2d_oversize_request_skips_batcher():
    """A request deeper than bucket_planes takes the direct path unchanged."""
    session = ServingSession(_serve_2d_config(), batch_planes=4)
    vol = np.random.RandomState(13).rand(6, 24, 24).astype(np.float32)
    pred = session.predict(vol)
    assert pred.shape == (1, 6, 24, 24)
    np.testing.assert_allclose(
        pred, session._predict_direct(vol, session._resolve_stats(vol)), atol=3e-5)
