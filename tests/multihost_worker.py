"""Worker process for the 2-process jax.distributed proof (test_multihost.py).

Each process owns 2 virtual CPU devices (4 global), initializes the
coordination service from P3DUNET_* env vars, builds the train loaders (train
files shard per process, val files replicate), assembles a global batch with
shard_batch, and runs ONE full train step over the global 4-device data mesh.
The parent asserts both processes print the SAME loss (gradient psum crossed
the process boundary).
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores JAX_PLATFORMS
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(tmpdir):
    from pytorch3dunet_tpu.parallel.distributed import initialize_from_env

    assert initialize_from_env(), "P3DUNET_COORDINATOR must be set"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import optax

    from pytorch3dunet_tpu.datasets.utils import get_train_loaders
    from pytorch3dunet_tpu.losses import get_loss_criterion
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.parallel.mesh import data_mesh, replicate, shard_batch

    config = {
        "device": "cpu",
        "loss": {"name": "BCEWithLogitsLoss"},
        "loaders": {
            "dataset": "StandardHDF5Dataset",
            "batch_size": 2,
            "num_workers": 1,
            "raw_internal_path": "raw",
            "label_internal_path": "label",
            "train": {
                # 3 files over 2 hosts: UNEQUAL per-host sample counts, so the
                # global-minimum batch cap must kick in (deadlock otherwise)
                "file_paths": [os.path.join(tmpdir, "t0.h5"), os.path.join(tmpdir, "t1.h5"),
                               os.path.join(tmpdir, "t2.h5")],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 64, 64],
                                  "stride_shape": [8, 64, 64]},
                "transformer": {
                    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "ToTensor", "expand_dims": True}],
                },
            },
            "val": {
                "file_paths": [os.path.join(tmpdir, "v.h5")],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 64, 64],
                                  "stride_shape": [8, 64, 64]},
                "transformer": {
                    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
                    "label": [{"name": "ToTensor", "expand_dims": True}],
                },
            },
        },
    }

    loaders = get_train_loaders(config)
    # per-host file sharding: 3 files round-robin over 2 processes (2 vs 1)
    train_sets = loaders["train"].dataset.datasets
    assert len(train_sets) in (1, 2), f"unexpected shard size {len(train_sets)}"
    names = ",".join(sorted(os.path.basename(ds.file_path) for ds in train_sets))
    print(f"SHARDED_FILE {jax.process_index()} {names}", flush=True)
    # unequal per-host sample counts: the loader must be capped to the GLOBAL
    # minimum batch count or the per-step collective deadlocks at epoch end
    print(f"NBATCHES {jax.process_index()} {len(loaders['train'])}", flush=True)

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
                       "num_groups": 4, "num_levels": 2, "final_sigmoid": True})
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 64, 64))
    tx = optax.sgd(1e-2)
    opt_state = tx.init(variables["params"])
    loss_criterion = get_loss_criterion(config)

    mesh = data_mesh()  # all 4 global devices
    variables = replicate(mesh, variables)
    opt_state = replicate(mesh, opt_state)

    raw, target = next(iter(loaders["train"]))
    inp = np.moveaxis(np.asarray(raw), 1, -1)
    tgt = np.moveaxis(np.asarray(target), 1, -1)
    inp, tgt = shard_batch(mesh, (inp, tgt))
    assert inp.shape[0] == 4, f"global batch should be 4 (2 local x 2 hosts), got {inp.shape}"

    @jax.jit
    def train_step(variables, opt_state, x, y):
        def loss_fn(params):
            _, logits = model.module.apply({"params": params}, x, train=False)
            return loss_criterion(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        return {"params": optax.apply_updates(variables["params"], updates)}, new_opt_state, loss

    variables, opt_state, loss = train_step(variables, opt_state, inp, tgt)
    loss_val = float(jax.device_get(loss))
    assert np.isfinite(loss_val)
    print(f"MULTIHOST_OK {jax.process_index()} loss={loss_val:.6f}", flush=True)

    # full-trainer proof: UNetTrainer.fit() across both processes — global
    # mesh, capped epochs, local-shard metrics, process-0-only checkpointing
    from pytorch3dunet_tpu.trainer import create_trainer

    ckpt_dir = os.path.join(tmpdir, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    train_config = {
        "device": "cpu",
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
                  "num_groups": 4, "num_levels": 2, "layer_order": "gcr", "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "DiceCoefficient"},
        "optimizer": {"learning_rate": 1e-3},
        "lr_scheduler": {"name": "MultiStepLR", "milestones": [100], "gamma": 0.5},
        "trainer": {"checkpoint_dir": ckpt_dir, "resume": None, "validate_after_iters": 2,
                    "log_after_iters": 1, "max_num_epochs": 4, "max_num_iterations": 2,
                    "eval_score_higher_is_better": True},
        "loaders": config["loaders"],
    }
    trainer = create_trainer(train_config)
    trainer.fit()
    ckpt = os.path.join(ckpt_dir, "last_checkpoint.pytorch")
    if jax.process_index() == 0:
        assert os.path.exists(ckpt), "process 0 must write the checkpoint"
    print(f"TRAINER_OK {jax.process_index()} iters={trainer.num_iterations}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
