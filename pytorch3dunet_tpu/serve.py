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
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("UNet3DServe")


class ServingSession:
    """A resident model + compiled-sweep cache behind a device lock."""

    def __init__(self, config: dict, pad_to_multiple=None):
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
        self._lock = threading.Lock()
        self._n_served = 0

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
        spatial = volume.shape[1:] if volume.ndim == 4 else volume.shape
        crop = None
        if self.pad_to_multiple is not None:
            pads = [(-s) % m for s, m in zip(spatial, self.pad_to_multiple)]
            if any(pads):
                width = [(0, p) for p in pads]
                if volume.ndim == 4:
                    width = [(0, 0)] + width
                volume = np.pad(volume, width, mode="reflect")
                crop = tuple(slice(0, s) for s in spatial)
        stats = self._resolve_stats(volume)
        with self._lock:
            probs = self.predictor.predict_array(
                volume, self.patch_shape, self.stride_shape, self.halo_shape,
                normalize=self.normalize, stats=stats,
            )
            self._n_served += 1
        if crop is not None:
            probs = probs[(slice(None),) + crop]
        if segmentation:
            return self.predictor._to_segmentation(probs)
        return probs

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

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            self._reply_json(200, {"status": "ok"})
        elif path == "/info":
            self._reply_json(200, self.session.info())
        else:
            self._reply_json(404, {"error": f"unknown path {path!r}"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/predict":
            self._reply_json(404, {"error": f"unknown path {url.path!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                raise ValueError("empty request body (send numpy.save bytes)")
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
    args = parser.parse_args()

    setup_compilation_cache()
    config = load_config_file(args.config)
    session = ServingSession(config, pad_to_multiple=args.pad_to_multiple)
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
