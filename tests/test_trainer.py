"""End-to-end trainer tests: build from config, fit 2 iterations, resume from
the checkpoint — over a loss x model matrix (reference: tests/test_trainer.py).
"""

import os

import h5py
import numpy as np
import pytest

from pytorch3dunet_tpu.trainer import create_trainer


def _add_paths(config, tmpdir, binary_loss: bool):
    train_path = _create_random_input(tmpdir, "train.h5", binary_loss)
    val_path = _create_random_input(tmpdir, "val.h5", binary_loss)
    config["loaders"]["train"]["file_paths"] = [train_path]
    config["loaders"]["val"]["file_paths"] = [val_path]
    config["trainer"]["checkpoint_dir"] = os.path.join(tmpdir, "checkpoints")
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)
    return config


def _create_random_input(tmpdir, name, binary_loss):
    path = os.path.join(tmpdir, name)
    shape = (32, 128, 128)
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(3, *shape))
        if binary_loss:
            f.create_dataset("label", data=np.random.randint(0, 2, shape).astype(np.float32))
        else:
            f.create_dataset("label", data=np.random.randint(0, 2, shape))
    return path


def _set_loss(config, loss_name, eval_name="MeanIoU"):
    binary = loss_name in ["BCEWithLogitsLoss", "DiceLoss", "BCEDiceLoss", "GeneralizedDiceLoss"]
    config["loss"] = {"name": loss_name}
    config["eval_metric"] = {"name": eval_name}
    if binary:
        # binary losses expect a channel target of the same shape as the output
        config["model"]["out_channels"] = 1
        for phase in ["train", "val"]:
            label_cfg = config["loaders"][phase]["transformer"]["label"]
            for t in label_cfg:
                if t["name"] == "ToTensor":
                    t["expand_dims"] = True
                    t.pop("dtype", None)
        config["eval_metric"] = {"name": "DiceCoefficient"}
    return binary


def _assert_train_save_load(config, tmpdir, loss_name):
    binary = _set_loss(config, loss_name)
    config = _add_paths(config, str(tmpdir), binary)

    trainer = create_trainer(config)
    trainer.fit()
    assert trainer.num_iterations > config["trainer"]["max_num_iterations"]

    checkpoint = os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch")
    assert os.path.exists(checkpoint)

    # resume from the checkpoint
    resume_config = dict(config)
    resume_config["trainer"] = dict(config["trainer"])
    resume_config["trainer"]["resume"] = checkpoint
    trainer2 = create_trainer(resume_config)
    trainer2.fit()
    assert trainer2.num_iterations >= trainer.num_iterations


@pytest.mark.parametrize("loss_name", ["CrossEntropyLoss", "WeightedCrossEntropyLoss", "BCEWithLogitsLoss",
                                       "DiceLoss"])
def test_unet3d_train_save_load(train_config, tmpdir, loss_name):
    _assert_train_save_load(train_config, tmpdir, loss_name)


def test_residual_unet3d(train_config, tmpdir):
    train_config["model"]["name"] = "ResidualUNet3D"
    train_config["model"]["num_levels"] = 3
    _assert_train_save_load(train_config, tmpdir, "CrossEntropyLoss")


def test_unet2d(train_config_2d, tmpdir):
    _assert_train_save_load(train_config_2d, tmpdir, "CrossEntropyLoss")


def test_golden_dice_on_learnable_target(train_config, tmpdir):
    """Training-accuracy golden gate: a thresholded-raw target must be learned
    to Dice > 0.85 within 60 iterations (synthetic stand-in for the
    reference's real-data gates, tests/test_criterion.py:95-120, whose LFS
    volume is absent in this environment)."""
    config = train_config
    _set_loss(config, "BCEDiceLoss")
    # 1-channel eval probabilities need sigmoid (softmax over one channel
    # is constant 1.0 and the Dice gate would measure nothing)
    config["model"]["final_sigmoid"] = True
    config = _add_paths(config, str(tmpdir), binary_loss=True)
    config["trainer"]["max_num_iterations"] = 60
    config["trainer"]["max_num_epochs"] = 30
    config["trainer"]["validate_after_iters"] = 20
    config["trainer"]["log_after_iters"] = 100
    config["optimizer"]["learning_rate"] = 5e-3

    for name in ["train", "val"]:
        path = config["loaders"][name]["file_paths"][0]
        with h5py.File(path, "r+") as f:
            raw = f["raw"][:]
            del f["label"]
            f.create_dataset("label", data=(raw[0] > 0.5).astype(np.float32))

    trainer = create_trainer(config)
    trainer.fit()
    assert trainer.best_eval_score > 0.85, f"best eval Dice {trainer.best_eval_score}"


def test_loss_decreases(train_config, tmpdir):
    """Training on a learnable target must reduce the loss."""
    config = train_config
    _set_loss(config, "DiceLoss")
    config = _add_paths(config, str(tmpdir), binary_loss=True)
    config["trainer"]["max_num_iterations"] = 12
    config["trainer"]["max_num_epochs"] = 10
    config["trainer"]["validate_after_iters"] = 100
    config["trainer"]["log_after_iters"] = 100
    config["optimizer"]["learning_rate"] = 1e-2

    # target = thresholded raw channel: learnable from the input
    train_path = config["loaders"]["train"]["file_paths"][0]
    with h5py.File(train_path, "r+") as f:
        raw = f["raw"][:]
        del f["label"]
        f.create_dataset("label", data=(raw[0] > 0.5).astype(np.float32))

    trainer = create_trainer(config)
    losses = []
    orig_step_builder = trainer._build_train_step

    def tracking_builder():
        step = orig_step_builder()

        def wrapped(*args):
            out = step(*args)
            losses.append(float(out[2]))
            return out

        return wrapped

    trainer._build_train_step = tracking_builder
    trainer.fit()
    assert len(losses) >= 10
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), f"loss did not decrease: {losses}"


def test_resume_auto(train_config, tmpdir):
    """resume: auto starts fresh without a checkpoint, then resumes counters
    from last_checkpoint.pytorch on an identical re-launch (preemption-safe)."""
    binary = _set_loss(train_config, "CrossEntropyLoss")
    config = _add_paths(train_config, str(tmpdir), binary)
    config["trainer"]["resume"] = "auto"

    trainer = create_trainer(config)
    trainer.fit()  # no checkpoint yet: starts fresh
    iters_after_first = trainer.num_iterations
    assert os.path.exists(os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch"))

    # identical config re-launch picks the checkpoint up
    resume_config = dict(config)
    resume_config["trainer"] = dict(config["trainer"])
    trainer2 = create_trainer(resume_config)
    assert trainer2._pending_resume is not None
    trainer2.fit()
    assert trainer2.num_iterations >= iters_after_first


def test_device_metric_validation_path(train_config, tmpdir):
    """max_val_images=0 forces every val batch onto the device metric twin:
    scores must stay finite and equal the host path's average."""
    binary = _set_loss(train_config, "DiceLoss")
    config = _add_paths(train_config, str(tmpdir), binary)
    config["trainer"]["max_val_images"] = 0

    trainer = create_trainer(config)
    trainer.fit()
    assert trainer._device_metric_fn is not None  # DiceCoefficient has a twin
    device_score = trainer.validate()
    assert np.isfinite(device_score)

    # identical weights, host path (max_val_images covers all batches)
    trainer.max_val_images = 10**6
    from pytorch3dunet_tpu.trainer import _UNSET

    trainer._device_metric_fn = _UNSET  # re-resolve lazily
    host_trainer_score = trainer.validate()
    # re-resolution lands on the device twin again; compare by disabling it
    trainer._device_metric_fn = None
    host_score = trainer.validate()
    assert device_score == pytest.approx(host_score, abs=1e-5)
    assert host_trainer_score == pytest.approx(host_score, abs=1e-5)


def test_async_checkpoint_snapshot_survives_donation(train_config, tmpdir):
    """The background save must capture the state AT SAVE TIME: later train
    steps donate (invalidate) the live buffers, so the checkpoint written
    behind them has to come from the device-side snapshot copies."""
    import jax

    from pytorch3dunet_tpu.utils.checkpoint import load_checkpoint

    binary = _set_loss(train_config, "DiceLoss")
    config = _add_paths(train_config, str(tmpdir), binary)
    # save fires at iteration 2; iterations 3..6 keep training (and donating)
    config["trainer"]["validate_after_iters"] = 2
    config["trainer"]["max_num_iterations"] = 6

    trainer = create_trainer(config)
    assert trainer.async_checkpoint
    recorded = []
    real_save = trainer._save_checkpoint

    def recording_save(is_best):
        recorded.append((trainer.num_iterations, jax.device_get(trainer.variables)))
        real_save(is_best)

    trainer._save_checkpoint = recording_save
    trainer.fit()
    assert trainer._ckpt_future is None  # fit() drained the background save
    assert len(recorded) >= 2  # saves at iterations 2, 4, 6 raced later steps

    # earlier saves' files were overwritten; the last one is on disk
    at_iters, at_state = recorded[-1]
    checkpoint = os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch")
    state = load_checkpoint(checkpoint, trainer.variables)
    # the checkpoint stores the NEXT iteration number (the resume point)
    assert state["num_iterations"] == at_iters + 1
    loaded = jax.tree_util.tree_leaves(state["model_state_dict"])
    live = jax.tree_util.tree_leaves(at_state)
    assert len(loaded) == len(live)
    for a, b in zip(loaded, live):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # deterministic donation check: snapshot a save but DEFER its background
    # write, run a donating train step (invalidating the live buffers the
    # snapshot copied from), then run the write. If the snapshot referenced
    # the donated buffers instead of owning copies, the deferred device_get
    # would read deleted buffers.
    deferred = []

    class DeferredExecutor:
        def submit(self, fn, *args, **kwargs):
            from concurrent.futures import Future

            deferred.append((fn, args, kwargs))
            f = Future()
            f.set_result(None)
            return f

    trainer._ckpt_executor = DeferredExecutor()
    expected_iters = trainer.num_iterations
    expected = jax.device_get(trainer.variables)
    real_save(is_best=False)  # snapshot now, write deferred

    batch, target = next(iter(trainer.loaders["train"]))
    inp, tgt = trainer._prepare_batch(batch, target, augment=False)
    step_rng = jax.random.PRNGKey(123)
    trainer.variables, trainer.opt_state, _, _ = trainer._train_step_fn(
        trainer.variables, trainer.opt_state, step_rng, inp, tgt)  # donates the old buffers

    (fn, args, kwargs), = deferred
    fn(*args, **kwargs)  # the background write runs AFTER the donation
    state = load_checkpoint(checkpoint, trainer.variables)
    assert state["num_iterations"] == expected_iters + 1  # resume point
    for a, b in zip(jax.tree_util.tree_leaves(state["model_state_dict"]),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sync_checkpoint_opt_out(train_config, tmpdir):
    """trainer.async_checkpoint: false writes inline (file exists immediately
    after _save_checkpoint returns, no future in flight)."""
    binary = _set_loss(train_config, "DiceLoss")
    config = _add_paths(train_config, str(tmpdir), binary)
    config["trainer"]["async_checkpoint"] = False

    trainer = create_trainer(config)
    assert not trainer.async_checkpoint
    trainer.fit()
    assert trainer._ckpt_future is None
    assert os.path.exists(os.path.join(config["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch"))
