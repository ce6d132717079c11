"""EMA weights (`trainer.ema_decay`): recurrence math, checkpointing, predict."""

import copy
import os

import h5py
import jax
import numpy as np

from pytorch3dunet_tpu.trainer import create_trainer
from pytorch3dunet_tpu.utils.checkpoint import apply_ema_weights, bytes_to_state


def _make_data(tmpdir):
    rs = np.random.RandomState(7)
    paths = {}
    for name in ("train.h5", "val.h5"):
        path = os.path.join(str(tmpdir), name)
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=rs.rand(3, 32, 128, 128))
            f.create_dataset("label", data=rs.randint(0, 2, (32, 128, 128)))
        paths[name] = path
    return paths


def _configure(config, tmpdir, paths, tag, iters=3, decay=0.5):
    config = copy.deepcopy(config)
    config["loaders"]["train"]["file_paths"] = [paths["train.h5"]]
    config["loaders"]["val"]["file_paths"] = [paths["val.h5"]]
    config["loaders"]["batch_size"] = 1
    config["trainer"]["checkpoint_dir"] = os.path.join(str(tmpdir), f"ckpt_{tag}")
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)
    config["trainer"]["max_num_iterations"] = iters
    config["trainer"]["max_num_epochs"] = 1
    config["trainer"]["validate_after_iters"] = 100
    config["trainer"]["log_after_iters"] = 100
    config["trainer"]["ema_decay"] = decay
    config["optimizer"] = {"name": "SGD", "learning_rate": 0.05, "momentum": 0.9}
    return config


def _spy_params(trainer, seen):
    """Captures the initial params and the post-update params of every step."""
    orig_init = trainer._ensure_initialized
    orig_ema = trainer._ema_step

    def init_spy(x):
        first = trainer.variables is None
        orig_init(x)
        if first:
            seen.append(jax.device_get(trainer.variables["params"]))

    def ema_spy():
        seen.append(jax.device_get(trainer.variables["params"]))
        orig_ema()

    trainer._ensure_initialized = init_spy
    trainer._ema_step = ema_spy


def test_ema_matches_manual_recurrence(train_config, tmpdir):
    paths = _make_data(tmpdir)
    np.random.seed(11)
    cfg = _configure(train_config, tmpdir, paths, "rec", decay=0.5)
    trainer = create_trainer(cfg)
    seen = []
    _spy_params(trainer, seen)
    trainer.fit()
    assert len(seen) >= 3  # p0 + at least two steps

    d = 0.5
    ema = seen[0]
    for p in seen[1:]:
        ema = jax.tree_util.tree_map(lambda e, q: d * e + (1 - d) * q, ema, p)
    got = jax.device_get(trainer.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)

    # the EMA trails the raw weights (d=0.5 over 2+ SGD steps -> visibly so),
    # and validation runs with the EMA weights
    raw = jax.tree_util.tree_leaves(jax.device_get(trainer.variables["params"]))
    assert any(np.abs(a - b).max() > 1e-7 for a, b in zip(jax.tree_util.tree_leaves(got), raw))
    assert trainer._eval_variables()["params"] is trainer.ema_params


def test_checkpoint_carries_ema_and_resume_restores(train_config, tmpdir):
    paths = _make_data(tmpdir)
    np.random.seed(12)
    cfg = _configure(train_config, tmpdir, paths, "ckpt", iters=2)
    cfg["trainer"]["validate_after_iters"] = 2  # force a checkpoint
    trainer = create_trainer(cfg)
    trainer.fit()

    ckpt_path = os.path.join(cfg["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch")
    with open(ckpt_path, "rb") as f:
        state = bytes_to_state(f.read())
    assert state.get("ema_state_dict"), "checkpoint must carry the EMA weights"
    saved_ema = state["ema_state_dict"]

    # resume: the EMA tree is restored from the checkpoint, not re-seeded.
    # The checkpoint stores num_epochs+1 (reference semantics, trainer.py:395):
    # a mid-epoch save resumes at the NEXT epoch, so the epoch budget must
    # grow along with the iteration budget for the resumed run to train.
    cfg2 = _configure(train_config, tmpdir, paths, "ckpt", iters=4)
    cfg2["trainer"]["max_num_epochs"] = 2
    cfg2["trainer"]["resume"] = ckpt_path
    trainer2 = create_trainer(cfg2)
    seen = []
    orig_init = trainer2._ensure_initialized

    def init_spy(x):
        first = trainer2.variables is None
        orig_init(x)
        if first:
            seen.append(jax.device_get(trainer2.ema_params))

    trainer2._ensure_initialized = init_spy
    trainer2.fit()
    assert seen, "resume never initialized"
    for a, b in zip(jax.tree_util.tree_leaves(seen[0]), saved_ema):
        np.testing.assert_allclose(a, b, atol=0)


def test_ema_composes_with_spatial_sharding(train_config, tmpdir):
    """The EMA tree_map runs on the spatially-sharded trainer's replicated
    params: the sharded EMA trajectory equals the unsharded one."""
    paths = _make_data(tmpdir)

    np.random.seed(21)
    cfg_sp = _configure(train_config, tmpdir, paths, "sp_ema", iters=2)
    cfg_sp["trainer"]["spatial_sharding"] = True
    trainer_sp = create_trainer(cfg_sp)
    trainer_sp.fit()
    assert trainer_sp.mesh is not None and trainer_sp.mesh.devices.size > 1

    np.random.seed(21)
    cfg_pl = _configure(train_config, tmpdir, paths, "pl_ema", iters=2)
    trainer_pl = create_trainer(cfg_pl)
    trainer_pl.fit()

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trainer_sp.ema_params)),
                    jax.tree_util.tree_leaves(jax.device_get(trainer_pl.ema_params))):
        # D-sharded conv/GN reductions legitimately reorder fp sums
        # (measured max |diff| ~1e-4 over 2 SGD steps at lr=0.05)
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_apply_ema_weights(train_config, tmpdir):
    paths = _make_data(tmpdir)
    np.random.seed(13)
    cfg = _configure(train_config, tmpdir, paths, "apply", iters=2)
    cfg["trainer"]["validate_after_iters"] = 2
    trainer = create_trainer(cfg)
    trainer.fit()
    ckpt_path = os.path.join(cfg["trainer"]["checkpoint_dir"], "last_checkpoint.pytorch")

    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.utils.checkpoint import load_checkpoint

    model = get_model(dict(cfg["model"]))
    template = model.init(jax.random.PRNGKey(0))
    state = load_checkpoint(ckpt_path, template)
    variables, used = apply_ema_weights(state, state["model_state_dict"])
    assert used
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]), state["ema_state_dict"]):
        np.testing.assert_allclose(np.asarray(a), b, atol=0)

    # without the key nothing changes
    same, used = apply_ema_weights({"model_state_dict": template}, template)
    assert not used and same is template
