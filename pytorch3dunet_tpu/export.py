"""export3dunet CLI: package a trained model as a self-contained serving artifact.

The reference deploys by shipping its python package plus a `.pytorch`
checkpoint and re-running `predict.py` (reference predict.py:41-66 loads
`model_path` into a freshly built torch module). For TPU production serving we
can do better: `jax.export` serializes the jit-compiled forward — weights
baked in as constants, StableHLO body, versioned serialization — into one
artifact that any JAX runtime can execute WITHOUT this package, its config
schema, or the checkpoint format.

Artifact layout (a zip, conventionally `.u3dx`):

    forward.jaxexport   serialized jax.export.Exported:
                        raw patch (B, [D,] H, W, Cin) float32
                          -> probabilities (B, [D,] H, W, Cout) float32
                        (normalization, the network, and final activation all
                        inside; B symbolic unless --batch fixes it)
    meta.json           model section, normalization mode/stats, patch
                        constraints (pool divisibility), in/out channels,
                        lowering platforms, jax/framework versions

The exported function is the serving unit: the sliding-window sweep around it
is host orchestration (see `inference_device.DeviceSlidingWindow`), and a
server that wants the sweep re-creates it from `meta.json`'s patch fields.

Usage:
    export3dunet --config test_config.yml --output model.u3dx
    export3dunet --config train_config.yml --checkpoint best.ckpt \
        --output model.u3dx --batch 8 --platforms tpu,cpu

Loading (no pytorch3dunet_tpu needed at the loading side):
    from jax import export
    with zipfile.ZipFile("model.u3dx") as z:
        fn = export.deserialize(z.read("forward.jaxexport"))
    probs = fn.call(patch)   # under jit: jax.jit(fn.call)(patch)
"""

import argparse
import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax import export as jax_export

from pytorch3dunet_tpu.__version__ import __version__
from pytorch3dunet_tpu.models import get_model, is_model_2d
from pytorch3dunet_tpu.utils import get_logger
from pytorch3dunet_tpu.utils.checkpoint import apply_ema_weights, load_checkpoint

logger = get_logger("ExportModel")

META_NAME = "meta.json"
FORWARD_NAME = "forward.jaxexport"


def _normalize_fn(mode: str, stats: dict):
    """The on-device normalization matching inference_device._normalize_patch,
    applied per sample so batched serving matches patch-by-patch serving."""
    if mode is None:
        return lambda x: x

    def per_sample(fn):
        return lambda x: jax.vmap(fn)(x)

    if mode == "standardize":
        mean = float(stats["mean"])
        std = float(stats["std"])
        return lambda x: (x - mean) / max(std, 1e-10)
    if mode == "standardize_patch":
        return per_sample(lambda p: (p - jnp.mean(p)) / jnp.clip(jnp.std(p), 1e-10))
    if mode == "normalize":
        def minmax(p):
            lo, hi = jnp.min(p), jnp.max(p)
            return jnp.clip(2 * (p - lo) / (hi - lo + 1e-10) - 1, -1, 1)

        return per_sample(minmax)
    if mode == "percentile":
        pmin = float(stats.get("pmin", 1.0))
        pmax = float(stats.get("pmax", 99.6))

        def pct(p):
            lo = jnp.percentile(p, pmin)
            hi = jnp.percentile(p, pmax)
            return (p - lo) / (hi - lo + 1e-10)

        return per_sample(pct)
    raise ValueError(f"Unsupported normalization mode for export: {mode!r}")


def export_model(config: dict, checkpoint_path: str | None, output_path: str,
                 patch_shape=None, batch="poly", platforms=("tpu", "cpu"),
                 normalize=None, stats=None) -> dict:
    """Builds the model, restores weights, exports the serving forward.

    Args:
        config: full YAML config dict (its `model` section is required).
        checkpoint_path: checkpoint to bake in (native or torch); defaults to
            the config's `model_path`; None with no model_path exports the
            fresh initialization (useful only for tests).
        patch_shape: spatial shape the artifact serves. Defaults to the
            model's minimal pool-divisible shape; any pool-divisible shape
            works at export time but the artifact is specialized to this one
            (XLA requires static spatial dims for conv tiling — SURVEY.md §3).
        batch: 'poly' (symbolic batch dim, default) or a fixed int.
        platforms: lowering targets recorded in the artifact; a multi-platform
            artifact runs on any of them.
        normalize: optional on-device normalization baked in front of the
            network ('standardize' | 'standardize_patch' | 'normalize' |
            'percentile'); `stats` supplies mean/std (pmin/pmax).

    Returns the metadata dict written into the artifact.
    """
    model = get_model(config["model"])
    variables = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))
    checkpoint_path = checkpoint_path or config.get("model_path")
    if checkpoint_path:
        state = load_checkpoint(checkpoint_path, variables)
        variables = state["model_state_dict"]
        variables, used_ema = apply_ema_weights(state, variables)
        if used_ema:
            logger.info("Checkpoint carries EMA weights: exporting them")
    else:
        logger.warning("No checkpoint given (and no model_path in the config): "
                       "exporting the fresh initialization")

    if patch_shape is None:
        patch_shape = model.example_input().shape[1:-1]
    patch_shape = tuple(int(s) for s in patch_shape)
    rank = model.spatial_rank
    assert len(patch_shape) == rank, (
        f"patch_shape must have {rank} spatial dims for {type(model).__name__}, got {patch_shape}")
    pool = model.pool_kernel_size
    factor = (pool if isinstance(pool, int) else max(pool)) ** (len(model.f_maps) - 1)
    assert all(s % factor == 0 for s in patch_shape), (
        f"every patch dim must be divisible by {factor} "
        f"(pool factor over {len(model.f_maps)} levels), got {patch_shape}")

    norm = _normalize_fn(normalize, stats or {})

    def forward(x):
        probs, _logits = model.module.apply(variables, norm(x), train=False)
        return probs

    if batch == "poly":
        (b,) = jax_export.symbolic_shape("b")
        batch_dim = b
    else:
        batch_dim = int(batch)
    arg = jax.ShapeDtypeStruct((batch_dim, *patch_shape, model.in_channels), jnp.float32)
    exported = jax_export.export(jax.jit(forward), platforms=list(platforms))(arg)
    blob = exported.serialize()

    meta = {
        "format": "pytorch3dunet_tpu.export/1",
        "framework_version": __version__,
        "jax_version": jax.__version__,
        "model": dict(config["model"]),
        "is_2d": is_model_2d(model),
        "in_channels": model.in_channels,
        "out_channels": model.out_channels,
        "patch_shape": list(patch_shape),
        "batch": "poly" if batch == "poly" else int(batch),
        "pool_divisibility": factor,
        "platforms": list(platforms),
        "normalize": normalize,
        "stats": {k: float(v) for k, v in (stats or {}).items()},
        "checkpoint": checkpoint_path,
        "n_params": int(sum(x.size for x in jax.tree_util.tree_leaves(variables))),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(META_NAME, json.dumps(meta, indent=2))
        z.writestr(FORWARD_NAME, blob)
    with open(output_path, "wb") as f:
        f.write(buf.getvalue())
    logger.info(f"Exported {meta['n_params']:,} params -> {output_path} "
                f"({len(blob) / 1e6:.1f} MB StableHLO, platforms={list(platforms)}, "
                f"patch={patch_shape}, batch={meta['batch']})")
    return meta


class ExportedModel:
    """A loaded serving artifact: `meta` dict + jitted `__call__`.

    Loading needs only jax (the artifact is weights + StableHLO); this class
    is a convenience wrapper for callers that already have the package.
    """

    def __init__(self, exported, meta: dict):
        self.exported = exported
        self.meta = meta
        self._call = jax.jit(exported.call)

    def __call__(self, x) -> np.ndarray:
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == len(self.meta["patch_shape"]) + 1  # unbatched patch
        if squeeze:
            x = x[None]
        out = self._call(x)
        return np.asarray(out[0] if squeeze else out)


def load_exported(path: str) -> ExportedModel:
    """Loads a `.u3dx` artifact written by `export_model`."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(META_NAME))
        exported = jax_export.deserialize(z.read(FORWARD_NAME))
    return ExportedModel(exported, meta)


def _parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Export a trained model as a jax.export serving artifact")
    parser.add_argument("--config", required=True,
                        help="YAML config with the model section (model_path used unless --checkpoint)")
    parser.add_argument("--checkpoint", "-i", default=None, help="checkpoint to bake in (native or torch)")
    parser.add_argument("--output", "-o", required=True, help="artifact path (conventionally .u3dx)")
    parser.add_argument("--patch-shape", type=int, nargs="+", default=None,
                        help="spatial patch shape served (default: the minimal pool-divisible shape)")
    parser.add_argument("--batch", default="poly",
                        help="'poly' (symbolic batch, default) or a fixed batch size")
    parser.add_argument("--platforms", default="tpu,cpu", help="comma-separated lowering targets")
    parser.add_argument("--normalize", default=None,
                        choices=["standardize", "standardize_patch", "normalize", "percentile"],
                        help="bake this normalization in front of the network")
    parser.add_argument("--mean", type=float, default=None)
    parser.add_argument("--std", type=float, default=None)
    parser.add_argument("--pmin", type=float, default=None)
    parser.add_argument("--pmax", type=float, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    assert "model" in config, "The config must contain a 'model' section"
    stats = {k: v for k, v in
             (("mean", args.mean), ("std", args.std), ("pmin", args.pmin), ("pmax", args.pmax))
             if v is not None}
    batch = args.batch if args.batch == "poly" else int(args.batch)
    export_model(config, args.checkpoint, args.output,
                 patch_shape=args.patch_shape, batch=batch,
                 platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
                 normalize=args.normalize, stats=stats)


if __name__ == "__main__":
    main()
