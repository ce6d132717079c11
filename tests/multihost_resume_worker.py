"""Worker for the multi-host failure drill (test_multihost.py).

Three modes, all the same 2-process jax.distributed fit() at 2 virtual CPU
devices per process (4 global):

  full        — train max_num_epochs straight through (the oracle trajectory).
  interrupted — process 1 SIGKILLs ITSELF after epoch 0's checkpoint lands
                (a mid-fit() host death); process 0 then enters epoch 1 and
                blocks in the gradient psum with its peer gone — the parent
                test reaps it. Only epoch 0's checkpoint survives on disk.
  resumed     — relaunch with trainer.resume: auto; both hosts pick up the
                epoch-0 checkpoint and train the remaining epochs.

The parent asserts the resumed run's final checkpoint is BIT-IDENTICAL to the
full run's: epoch-keyed loader shuffling (DataLoader.set_epoch) + the
checkpointed step-PRNG key make the replayed trajectory exact.
"""

import os
import signal
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores JAX_PLATFORMS
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

EPOCHS = 3
# files shard per host (d0->host0, d1->host1): 2 patches/host at local batch 2
# (1 per local device) -> 1 collective step per epoch
ITERS_PER_EPOCH = 1


def build_config(tmpdir, mode):
    ckpt_dir = os.path.join(tmpdir, "ckpt_full" if mode == "full" else "ckpt_drill")
    os.makedirs(ckpt_dir, exist_ok=True)
    transformer = {
        # deterministic pipeline: exact resume is defined for it (random
        # host-side augmentation draws are worker-stream-stateful)
        "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
        "label": [{"name": "ToTensor", "expand_dims": True}],
    }
    slice_builder = {"name": "SliceBuilder", "patch_shape": [8, 64, 64],
                     "stride_shape": [8, 64, 64]}
    return {
        "device": "cpu",
        "manual_seed": 11,
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
                  "num_groups": 4, "num_levels": 2, "layer_order": "gcr",
                  "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "DiceCoefficient"},
        "optimizer": {"learning_rate": 1e-3},
        "lr_scheduler": {"name": "MultiStepLR", "milestones": [100], "gamma": 0.5},
        "trainer": {
            "checkpoint_dir": ckpt_dir,
            "resume": "auto" if mode == "resumed" else None,
            # checkpoints land exactly at epoch boundaries (2 iters/epoch), so
            # the epoch-0 save is a clean resume point for the drill
            "validate_after_iters": ITERS_PER_EPOCH,
            "log_after_iters": 1,
            "max_num_epochs": EPOCHS,
            "max_num_iterations": 10_000,
            "eval_score_higher_is_better": True,
        },
        "loaders": {
            "dataset": "StandardHDF5Dataset",
            "batch_size": 2,
            "num_workers": 1,
            "raw_internal_path": "raw",
            "label_internal_path": "label",
            "train": {
                "file_paths": [os.path.join(tmpdir, "d0.h5"), os.path.join(tmpdir, "d1.h5")],
                "slice_builder": slice_builder,
                "transformer": transformer,
            },
            "val": {
                "file_paths": [os.path.join(tmpdir, "dv.h5")],
                "slice_builder": slice_builder,
                "transformer": transformer,
            },
        },
    }


def main(tmpdir, mode):
    from pytorch3dunet_tpu.parallel.distributed import initialize_from_env

    assert initialize_from_env(), "P3DUNET_COORDINATOR must be set"
    assert jax.process_count() == 2 and jax.device_count() == 4

    import random

    from pytorch3dunet_tpu.trainer import create_trainer

    config = build_config(tmpdir, mode)
    # manual_seed exactly as the train CLI applies it (train.py)
    np.random.seed(config["manual_seed"])
    random.seed(config["manual_seed"])

    trainer = create_trainer(config)
    assert len(trainer.loaders["train"]) == ITERS_PER_EPOCH, len(trainer.loaders["train"])

    if mode in ("full", "resumed"):
        trainer.fit()
        print(f"FIT_DONE {jax.process_index()} epochs={trainer.num_epochs} "
              f"iters={trainer.num_iterations}", flush=True)
        return

    assert mode == "interrupted"
    # fit()'s epoch loop, opened up so this host can die mid-run: epoch 0
    # trains and checkpoints (validate_after_iters == iters/epoch), then
    # process 1 vanishes the way a preempted/crashed host does
    trainer.train()
    trainer.num_epochs += 1
    trainer._wait_checkpoint()  # the resume point must be on disk before dying
    if jax.process_index() == 1:
        print("DRILL_DYING 1", flush=True)
        sys.stdout.flush()
        os.kill(os.getpid(), signal.SIGKILL)
    # the surviving host proceeds into epoch 1; its first gradient psum can
    # never complete with the peer gone — the parent reaps this process
    print("DRILL_SURVIVOR_ENTERING_EPOCH1 0", flush=True)
    trainer.train()
    raise AssertionError("epoch 1 completed without the peer — collectives did not span hosts")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
