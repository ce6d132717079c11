"""predict3dunet CLI entry point (reference: pytorch3dunet/predict.py)."""

import importlib
import os

import jax
import numpy as np

from pytorch3dunet_tpu.config import load_config
from pytorch3dunet_tpu.datasets.utils import get_test_loaders
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.utils import get_logger
from pytorch3dunet_tpu.utils.checkpoint import load_checkpoint

logger = get_logger("UNet3DPredict")


def get_predictor(model, variables, config: dict):
    """Resolves the predictor class from config['predictor'] (reference predict.py:20-40)."""
    output_dir = config["loaders"].get("output_dir", None)
    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)

    predictor_config = dict(config.get("predictor", {}))
    class_name = predictor_config.pop("name", "StandardPredictor")
    force_host = predictor_config.pop("force_host", False)

    device = str(config.get("device", ""))
    if class_name == "StandardPredictor" and "tpu" in device.lower() and not force_host:
        # TPU default: the device-side sweep (single upload + jitted patch
        # loop + sharded grid) replaces the per-patch host loop; it falls back
        # to the host path itself for 2D models / unsupported transformers.
        # `force_host: true` in the predictor config opts out.
        logger.info("TPU device: using DeviceSlidingWindowPredictor (set predictor.force_host to opt out)")
        class_name = "DeviceSlidingWindowPredictor"

    m = importlib.import_module("pytorch3dunet_tpu.predictor")
    predictor_class = getattr(m, class_name)
    out_channels = config["model"].get("out_channels")
    return predictor_class(model, variables, output_dir, out_channels, **predictor_config,
                           device=config["device"])


def load_model_variables(model, model_path):
    """Initializes `model` and restores inference weights from `model_path`
    (EMA weights preferred when the checkpoint carries them). Shared by the
    predict3dunet and serve3dunet entry points.

    Parameters are shape-independent of the spatial dims: init with the
    default example shape, then restore from the checkpoint. The init is
    jitted: eager flax init dispatches hundreds of ops one by one, which
    costs seconds each over a tunneled TPU (CLAUDE.md).
    """
    from pytorch3dunet_tpu.utils.checkpoint import apply_ema_weights

    logger.info(f"Loading model from {model_path}...")
    variables = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))
    state = load_checkpoint(model_path, variables)
    variables, used_ema = apply_ema_weights(state, state["model_state_dict"])
    if used_ema:
        logger.info("Checkpoint carries EMA weights (trainer.ema_decay): predicting with them")
    return variables


def main():
    """Loads the model + checkpoint and runs prediction over every test loader."""
    from pytorch3dunet_tpu.parallel.distributed import initialize_from_env
    from pytorch3dunet_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    initialize_from_env()  # multi-host: no-op unless P3DUNET_COORDINATOR is set
    config, _ = load_config()

    model = get_model(config["model"])
    device = config.get("device", None)
    assert device, "Device not specified in the config file and could not be inferred automatically"
    logger.info(f"Using device: {device}")

    variables = load_model_variables(model, config["model_path"])

    logger.info("Creating predictor...")
    predictor = get_predictor(model, variables, config)

    metrics = []
    try:
        for test_loader in get_test_loaders(config):
            metric = predictor(test_loader)
            if metric is not None:
                metrics.append(metric)
    finally:
        # join the write-behind output write of the last volume (the device
        # predictor overlaps each volume's gzip H5 write with the next
        # volume's sweep). When the loop is already unwinding with its own
        # exception, a write failure here must not REPLACE it as the process
        # failure — log it and let the primary propagate; on the clean path
        # the write error is the failure and re-raises.
        import sys

        if sys.exc_info()[0] is None:
            predictor.finalize()
        else:
            try:
                predictor.finalize()
            except Exception:  # noqa: BLE001
                logger.exception("write-behind save ALSO failed while handling the error above")

    if metrics:
        metrics = np.asarray(metrics, dtype=np.float64)
        # multi-host: each process predicted a disjoint file shard, so these
        # are per-host averages over that shard
        prefix = f"[process {jax.process_index()}] " if jax.process_count() > 1 else ""
        logger.info(f"{prefix}Per-class average metric: {metrics.mean(axis=0)}")
        logger.info(f"{prefix}Average metric: {metrics.mean()}")


if __name__ == "__main__":
    main()
