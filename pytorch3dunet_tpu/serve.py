"""serve3dunet: an online HTTP inference server around the device sweep.

The reference stops at batch prediction scripts (pytorch3dunet/predict.py);
production deployments also need an online path: a resident process holding
the compiled model, answering prediction requests without per-request process
startup, checkpoint loads, or recompiles. This module serves the
`DeviceSlidingWindowPredictor` in-memory path over plain HTTP with a
stdlib-only server (no web-framework dependency):

    serve3dunet --config predict_config.yml --port 8000

    GET  /healthz            -> {"status": "ok"} liveness probe
    GET  /info               -> model/geometry/device metadata (JSON)
    POST /predict            -> body: a .npy volume, (D, H, W) or (C, D, H, W)
                                response: .npy (Cout, D, H, W) float32 probs
    POST /predict?output=segmentation
                             -> .npy (D, H, W) uint16 argmax/binarized labels

The config is the same YAML `predict3dunet` takes (model + model_path +
loaders.test.slice_builder geometry + transformer); `loaders.test.file_paths`
is not required. Volumes ride as raw numpy `.npy` bytes — `numpy.save` the
array into the request body, `numpy.load` the response
(`allow_pickle` stays False on both ends).

TPU-first serving notes:
- XLA compiles ONE sweep per input volume shape. The server pre-compiles the
  configured `warmup_shape` at startup (first compile over a tunneled TPU
  costs minutes; a request arriving later with that shape is pure compute).
  Deployments with heterogeneous volume sizes should enable
  `--pad-to-multiple Z Y X`: volumes reflect-pad up to the next multiple
  before the sweep and the prediction is cropped back, bounding the number
  of compiled programs by the bucket count.
- One device program runs at a time: requests serialize on an internal lock
  (the `ThreadingHTTPServer` keeps accepting and queueing meanwhile). TTA,
  gaussian blending, `patch_mode: slab`, and multi-chip grid sharding all
  apply exactly as in batch prediction.
"""

import argparse
import hmac
import io
import json
import os
import queue
import sys
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("UNet3DServe")

_LOOPBACK_HOSTS = ("127.0.0.1", "localhost", "::1", "")


class _MicroBatcher:
    """Cross-request micro-batching for 2D models.

    Concurrent /predict requests whose planes are geometry-compatible
    (same H, W, channels) coalesce into ONE device dispatch: a 2D model
    treats the z axis as batch, so stacking request volumes along z and
    padding to a fixed `bucket_planes` depth turns N round-trips into one
    `patch_batch`-style sweep with exactly one compiled shape. A request
    that arrives alone still takes the direct (unbatched, own-shape) path —
    no dead compute is added to sequential traffic.
    """

    def __init__(self, session, bucket_planes: int):
        self.session = session
        self.bucket_planes = int(bucket_planes)
        self._q: queue.Queue = queue.Queue()
        self.batched_dispatches = 0
        self.batched_requests = 0
        self._thread = threading.Thread(target=self._run, daemon=True, name="serve-microbatch")
        self._thread.start()

    @staticmethod
    def _key(volume: np.ndarray):
        # (channels, H, W): z is the batch axis, everything else must match
        return (volume.shape[0] if volume.ndim == 4 else None,) + tuple(volume.shape[-2:])

    def submit(self, volume: np.ndarray, stats: dict) -> Future:
        f: Future = Future()
        self._q.put((volume, stats, f))
        return f

    def _run(self):
        pending = None
        while True:
            first = pending if pending is not None else self._q.get()
            pending = None
            batch = [first]
            planes = first[0].shape[-3]
            while planes < self.bucket_planes:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if (self._key(nxt[0]) == self._key(first[0])
                        and planes + nxt[0].shape[-3] <= self.bucket_planes):
                    batch.append(nxt)
                    planes += nxt[0].shape[-3]
                else:
                    # incompatible or over-budget: it leads the next batch
                    pending = nxt
                    break
            try:
                if len(batch) == 1:
                    vol, stats, fut = batch[0]
                    fut.set_result(self.session._predict_direct(vol, stats))
                else:
                    self.batched_dispatches += 1
                    self.batched_requests += len(batch)
                    results = self.session._predict_batched([(v, s) for v, s, _ in batch])
                    for (_, _, fut), r in zip(batch, results):
                        fut.set_result(r)
            except Exception as e:  # noqa: BLE001 — surface per-request
                for *_, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)


class ServingSession:
    """A resident model + compiled-sweep cache behind a device lock."""

    def __init__(self, config: dict, pad_to_multiple=None, token: str | None = None,
                 max_request_bytes: int = 2 << 30, batch_planes: int = 24):
        import jax

        from pytorch3dunet_tpu.inference_device import detect_device_path
        from pytorch3dunet_tpu.models import get_model, is_model_2d
        from pytorch3dunet_tpu.predict import get_predictor, load_model_variables
        from pytorch3dunet_tpu.predictor import DeviceSlidingWindowPredictor

        self.config = config
        self.model = get_model(config["model"])
        model_path = config.get("model_path")
        if model_path:
            variables = load_model_variables(self.model, model_path)
        else:
            logger.warning("No model_path in the config: serving RANDOM weights (smoke-test mode)")
            variables = jax.jit(lambda key: self.model.init(key))(jax.random.PRNGKey(0))

        config.setdefault("predictor", {}).setdefault("name", "DeviceSlidingWindowPredictor")
        self.predictor = get_predictor(self.model, variables, config)
        assert isinstance(self.predictor, DeviceSlidingWindowPredictor), (
            f"serve3dunet serves the device sweep; got predictor "
            f"{type(self.predictor).__name__} (set predictor.name: DeviceSlidingWindowPredictor)"
        )

        sb = config["loaders"]["test"]["slice_builder"]
        self.patch_shape = tuple(sb["patch_shape"])
        self.stride_shape = tuple(sb.get("stride_shape", sb["patch_shape"]))
        self.halo_shape = tuple(sb.get("halo_shape", (0, 0, 0)))
        transformer = config["loaders"]["test"]["transformer"]["raw"]
        path = detect_device_path(transformer, config["loaders"].get("stats"))
        if path is None:
            raise ValueError(
                "The test transformer pipeline is not supported by the device sweep "
                "(supported: Standardize / Normalize / PercentileNormalizer + ToTensor); "
                "serve3dunet has no host fallback loop"
            )
        self.normalize, self.stats = path
        if self.normalize == "standardize_patch" and config["loaders"].get("global_normalization"):
            # global_normalization: the batch path computes mean/std over the
            # whole volume (datasets/hdf5.py _normalization_stats) and
            # standardizes with them; serving computes them per request
            # volume in _resolve_stats — matching semantics, no dataset
            self.normalize, self.stats = "standardize", {"mean": None, "std": None}
        self.is_2d = is_model_2d(self.model)
        self.pad_to_multiple = None if pad_to_multiple is None else tuple(int(m) for m in pad_to_multiple)
        self.token = token
        self.max_request_bytes = int(max_request_bytes)
        self._lock = threading.Lock()
        self._n_served = 0
        # cross-request micro-batching: 2D models only (z is a batch axis
        # there); percentile normalization has no exact host/none split
        self._batcher = None
        if self.is_2d and batch_planes and self.normalize != "percentile":
            self._batcher = _MicroBatcher(self, batch_planes)

    # ------------------------------------------------------------- inference

    def _resolve_stats(self, volume: np.ndarray) -> dict:
        """standardize with no fixed mean/std = the reference's per-volume
        global_normalization: compute the statistics from the request body."""
        stats = dict(self.stats)
        if self.normalize == "standardize" and stats.get("mean") is None:
            stats["mean"] = float(volume.mean())
            stats["std"] = float(volume.std())
        return stats

    def predict(self, volume: np.ndarray, segmentation: bool = False) -> np.ndarray:
        volume = np.asarray(volume, dtype=np.float32)
        # per-volume stats (global_normalization) come from the ORIGINAL
        # volume, before any pad_to_multiple reflection planes dilute them
        stats = self._resolve_stats(volume)
        if self._batcher is not None and volume.shape[-3] <= self._batcher.bucket_planes:
            probs = self._batcher.submit(volume, stats).result()
        else:
            probs = self._predict_direct(volume, stats)
        if segmentation:
            return self.predictor._to_segmentation(probs)
        return probs

    def _pad_to_multiple(self, volume: np.ndarray, axes=(0, 1, 2)):
        """Reflect-pads the selected spatial axes up to the configured
        multiples; returns (padded, crop) with crop covering ALL spatial axes."""
        spatial = volume.shape[1:] if volume.ndim == 4 else volume.shape
        crop = None
        if self.pad_to_multiple is not None:
            pads = [((-s) % m if i in axes else 0)
                    for i, (s, m) in enumerate(zip(spatial, self.pad_to_multiple))]
            if any(pads):
                width = [(0, p) for p in pads]
                if volume.ndim == 4:
                    width = [(0, 0)] + width
                volume = np.pad(volume, width, mode="reflect")
                crop = tuple(slice(0, s) for s in spatial)
        return volume, crop

    def _predict_direct(self, volume: np.ndarray, stats: dict) -> np.ndarray:
        volume, crop = self._pad_to_multiple(volume)
        with self._lock:
            probs = self.predictor.predict_array(
                volume, self.patch_shape, self.stride_shape, self.halo_shape,
                normalize=self.normalize, stats=stats,
            )
            self._n_served += 1
        if crop is not None:
            probs = probs[(slice(None),) + crop]
        return probs

    def _predict_batched(self, items) -> list:
        """One device dispatch for several geometry-compatible 2D requests.

        Volume-level normalization modes are applied per request on the host
        (a few MB of 2D planes; exact same math as the device kernel,
        inference_device._normalize_patch) and the device runs with
        normalize='none'; per-patch modes (standardize_patch) batch directly —
        the device computes those statistics per plane/tile either way.
        The stacked volume is edge-padded to the fixed `bucket_planes` depth,
        so every batched dispatch reuses ONE compiled sweep.
        """
        mode = self.normalize
        arrs = []
        for vol, stats in items:
            if mode == "standardize":
                vol = (vol - np.float32(stats["mean"])) / max(np.float32(stats["std"]), np.float32(1e-10))
            elif mode == "normalize":
                lo, hi = vol.min(), vol.max()
                vol = np.clip(2 * (vol - lo) / (hi - lo + 1e-10) - 1, -1, 1).astype(np.float32)
            arrs.append(vol)
        dev_mode = mode if mode == "standardize_patch" else "none"
        zaxis = arrs[0].ndim - 3
        depths = [a.shape[zaxis] for a in arrs]
        stacked = np.concatenate(arrs, axis=zaxis)
        bucket = self._batcher.bucket_planes
        pad = bucket - stacked.shape[zaxis]
        if pad:
            width = [(0, 0)] * stacked.ndim
            width[zaxis] = (0, pad)
            stacked = np.pad(stacked, width, mode="edge")
        stacked, crop = self._pad_to_multiple(stacked, axes=(1, 2))
        with self._lock:
            probs = self.predictor.predict_array(
                stacked, self.patch_shape, self.stride_shape, self.halo_shape,
                normalize=dev_mode, stats={},
            )
            self._n_served += len(items)
        if crop is not None:
            probs = probs[(slice(None), slice(None)) + crop[1:]]
        out, z = [], 0
        for d in depths:
            out.append(probs[:, z : z + d])
            z += d
        return out

    def warmup(self, shape=None):
        """Compiles the sweep for `shape` (default: one patch) at startup."""
        if shape is None:
            shape = tuple(max(p, 2 * h + p) for p, h in zip(self.patch_shape, self.halo_shape))
        logger.info(f"Warmup: compiling the sweep for volume shape {tuple(shape)}...")
        self.predict(np.zeros(tuple(shape), dtype=np.float32))
        logger.info("Warmup done")

    def info(self) -> dict:
        import jax

        return {
            "model": self.config["model"],
            "patch_shape": list(self.patch_shape),
            "stride_shape": list(self.stride_shape),
            "halo_shape": list(self.halo_shape),
            "normalize": self.normalize,
            "pad_to_multiple": list(self.pad_to_multiple) if self.pad_to_multiple else None,
            "devices": [str(d) for d in jax.local_devices()],
            "requests_served": self._n_served,
            "max_request_bytes": self.max_request_bytes,
            "auth": self.token is not None,
            "batching": None if self._batcher is None else {
                "bucket_planes": self._batcher.bucket_planes,
                "batched_dispatches": self._batcher.batched_dispatches,
                "batched_requests": self._batcher.batched_requests,
            },
            "predictor": {
                "patch_mode": self.predictor.patch_mode,
                "blend": self.predictor.blend,
                "tta": bool(self.predictor.tta),
            },
        }


class _Handler(BaseHTTPRequestHandler):
    session: ServingSession = None  # bound by make_server
    protocol_version = "HTTP/1.1"

    # route the stdlib request log through our logger (stderr noise otherwise)
    def log_message(self, fmt, *args):
        logger.info("%s %s" % (self.address_string(), fmt % args))

    def _reply(self, code: int, body: bytes, content_type: str):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        if code >= 400:
            # error paths may leave an unread request body on the socket
            # (e.g. a POST to a wrong path); closing keeps HTTP/1.1
            # keep-alive clients from parsing those bytes as a next request
            self.send_header("Connection", "close")
            self.close_connection = True
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj: dict):
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def _authorized(self) -> bool:
        """Bearer-token check (constant-time compare). /healthz is exempt so
        liveness probes need no secret; everything else 401s without it."""
        token = self.session.token
        if token is None:
            return True
        return hmac.compare_digest(self.headers.get("Authorization", ""), f"Bearer {token}")

    def _reply_401(self):
        self.send_response(401)
        self.send_header("WWW-Authenticate", 'Bearer realm="serve3dunet"')
        body = json.dumps({"error": "missing or invalid bearer token"}).encode()
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Connection", "close")
        self.close_connection = True
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            self._reply_json(200, {"status": "ok"})
        elif not self._authorized():
            self._reply_401()
        elif path == "/info":
            self._reply_json(200, self.session.info())
        else:
            self._reply_json(404, {"error": f"unknown path {path!r}"})

    def do_POST(self):
        url = urlparse(self.path)
        if not self._authorized():
            self._reply_401()
            return
        if url.path != "/predict":
            self._reply_json(404, {"error": f"unknown path {url.path!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                raise ValueError("empty request body (send numpy.save bytes)")
        except ValueError as e:
            self._reply_json(400, {"error": str(e)})
            return
        if length > self.session.max_request_bytes:
            # reject BEFORE reading: an oversize Content-Length must not be
            # buffered into RAM (the close keeps the unread body off the
            # next keep-alive request)
            self._reply_json(413, {
                "error": f"request body {length} bytes exceeds the "
                         f"{self.session.max_request_bytes}-byte limit"})
            return
        try:
            body = self.rfile.read(length)
            volume = np.load(io.BytesIO(body), allow_pickle=False)
            if volume.ndim not in (3, 4):
                raise ValueError(f"expected a (D, H, W) or (C, D, H, W) volume, got shape {volume.shape}")
            volume = np.asarray(volume, dtype=np.float32)
        except Exception as e:  # noqa: BLE001 - malformed input -> 400
            self._reply_json(400, {"error": str(e)})
            return
        output = parse_qs(url.query).get("output", ["probabilities"])[0]
        if output not in ("probabilities", "segmentation"):
            self._reply_json(400, {"error": f"output must be 'probabilities' or 'segmentation', got {output!r}"})
            return
        try:
            pred = self.session.predict(volume, segmentation=(output == "segmentation"))
        except Exception as e:  # noqa: BLE001 - surface inference errors as 500
            logger.exception("prediction failed")
            self._reply_json(500, {"error": str(e)})
            return
        buf = io.BytesIO()
        np.save(buf, pred)
        self._reply(200, buf.getvalue(), "application/octet-stream")


def make_server(session: ServingSession, host: str = "127.0.0.1", port: int = 8000) -> ThreadingHTTPServer:
    """Builds (without starting) the HTTP server bound to `session`."""
    handler = type("BoundHandler", (_Handler,), {"session": session})
    return ThreadingHTTPServer((host, port), handler)


def main():
    from pytorch3dunet_tpu.config import load_config_file
    from pytorch3dunet_tpu.utils.misc import setup_compilation_cache

    parser = argparse.ArgumentParser(description="Serve a trained 3D U-Net over HTTP")
    parser.add_argument("--config", required=True, help="predict3dunet-style YAML config")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the startup compile (first request pays it)")
    parser.add_argument("--warmup-shape", type=int, nargs=3, default=None,
                        help="volume shape to pre-compile (default: one patch)")
    parser.add_argument("--pad-to-multiple", type=int, nargs=3, default=None,
                        help="reflect-pad request volumes up to these (Z, Y, X) multiples "
                             "(bounds compile count under heterogeneous sizes)")
    parser.add_argument("--token", default=os.environ.get("P3DUNET_SERVE_TOKEN"),
                        help="bearer token required on every endpoint except /healthz "
                             "(default: $P3DUNET_SERVE_TOKEN; REQUIRED for non-loopback --host)")
    parser.add_argument("--insecure", action="store_true",
                        help="allow binding a non-loopback --host without --token")
    parser.add_argument("--max-request-mb", type=int, default=2048,
                        help="reject request bodies larger than this with 413 (default 2048)")
    parser.add_argument("--batch-planes", type=int, default=24,
                        help="2D models: coalesce concurrent requests into one dispatch of "
                             "up to this many planes (0 disables; default 24, the measured "
                             "full-plane patch_batch sweet spot)")
    args = parser.parse_args()

    if args.host not in _LOOPBACK_HOSTS and not args.token and not args.insecure:
        parser.error(
            f"--host {args.host} is reachable off-machine: pass --token (or set "
            "P3DUNET_SERVE_TOKEN) to require authentication, or --insecure to serve open")

    setup_compilation_cache()
    config = load_config_file(args.config)
    session = ServingSession(config, pad_to_multiple=args.pad_to_multiple, token=args.token,
                             max_request_bytes=args.max_request_mb << 20,
                             batch_planes=args.batch_planes)
    if not args.no_warmup:
        session.warmup(args.warmup_shape)

    server = make_server(session, args.host, args.port)
    logger.info(f"Serving on http://{args.host}:{server.server_address[1]} "
                "(POST /predict, GET /healthz, GET /info)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
