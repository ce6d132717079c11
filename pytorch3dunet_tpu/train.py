"""train3dunet CLI entry point (reference: pytorch3dunet/train.py)."""

import random

import numpy as np

from pytorch3dunet_tpu.config import copy_config, load_config
from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("TrainingSetup")


def main():
    """Loads the config, seeds the RNGs, builds the trainer, and runs fit()."""
    from pytorch3dunet_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    config, config_path = load_config()
    logger.info(config)

    manual_seed = config.get("manual_seed", None)
    if manual_seed is not None:
        logger.info(f"Seed the RNG for all devices with {manual_seed}")
        random.seed(manual_seed)
        np.random.seed(manual_seed)
        # the jax PRNG key is derived from manual_seed inside the trainer

    from pytorch3dunet_tpu.parallel.distributed import initialize_from_env
    from pytorch3dunet_tpu.trainer import create_trainer

    initialize_from_env()  # multi-host: no-op unless P3DUNET_COORDINATOR is set
    trainer = create_trainer(config)
    copy_config(config, config_path)
    trainer.fit()


if __name__ == "__main__":
    main()
