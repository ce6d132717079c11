"""Gradient accumulation (`trainer.grad_accum_steps`).

k accumulated batch-1 microbatches must equal one batch-k step exactly for
element-mean losses (CrossEntropy): grad((L0+L1)/2) == (grad(L0)+grad(L1))/2,
and GroupNorm statistics are per-sample. This gives TPU users the effective
batch without the HBM-locality wall that makes batch 2 slower per-voxel than
batch 1 on v5e (BENCH_NOTES r3).
"""

import os

import h5py
import numpy as np
import pytest

import jax

from pytorch3dunet_tpu.trainer import create_trainer


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


def _configure(config, tmpdir, paths, batch_size, accum, tag):
    config["loaders"]["train"]["file_paths"] = [paths["train.h5"]]
    config["loaders"]["val"]["file_paths"] = [paths["val.h5"]]
    config["loaders"]["batch_size"] = batch_size
    config["trainer"]["checkpoint_dir"] = os.path.join(str(tmpdir), f"ckpt_{tag}")
    os.makedirs(config["trainer"]["checkpoint_dir"], exist_ok=True)
    config["trainer"]["max_num_iterations"] = 2
    config["trainer"]["max_num_epochs"] = 1
    config["trainer"]["validate_after_iters"] = 100
    config["trainer"]["log_after_iters"] = 100
    # SGD, not Adam: Adam normalizes by sqrt(v), so a wrong gradient SCALE
    # (e.g. a missing /k) would barely move the params — SGD keeps the
    # equivalence check linearly sensitive to it, and avoids Adam's tiny-v
    # amplification of benign fp reduction-order noise
    config["optimizer"] = {"name": "SGD", "learning_rate": 0.05, "momentum": 0.9}
    if accum != 1:
        config["trainer"]["grad_accum_steps"] = accum
    return config


def _copy_cfg(config):
    import copy

    return copy.deepcopy(config)


def test_accum_matches_large_batch(train_config, tmpdir):
    """2 accumulated batch-1 microbatches == one batch-2 step (CE loss)."""
    paths = _make_data(tmpdir)

    np.random.seed(123)  # loader shuffle + transformer seeds derive from here
    cfg_a = _configure(_copy_cfg(train_config), tmpdir, paths, batch_size=1, accum=2, tag="accum")
    trainer_a = create_trainer(cfg_a)
    trainer_a.fit()
    assert trainer_a.num_iterations == 3  # 4 patches -> 2 groups -> 2 updates

    np.random.seed(123)  # identical sample permutation and grouping
    cfg_b = _configure(_copy_cfg(train_config), tmpdir, paths, batch_size=2, accum=1, tag="batch2")
    trainer_b = create_trainer(cfg_b)
    trainer_b.fit()
    assert trainer_b.num_iterations == 3

    params_a = jax.tree_util.tree_leaves(jax.device_get(trainer_a.variables["params"]))
    params_b = jax.tree_util.tree_leaves(jax.device_get(trainer_b.variables["params"]))
    assert len(params_a) == len(params_b)
    for pa, pb in zip(params_a, params_b):
        np.testing.assert_allclose(pa, pb, atol=1e-5, rtol=1e-4)


def test_trailing_partial_group_dropped(train_config, tmpdir):
    """4 patches at accum=3: one full group trains, the trailing 1 is dropped."""
    paths = _make_data(tmpdir)
    np.random.seed(0)
    cfg = _configure(_copy_cfg(train_config), tmpdir, paths, batch_size=1, accum=3, tag="drop")
    cfg["trainer"]["max_num_iterations"] = 10
    trainer = create_trainer(cfg)
    trainer.fit()
    # one optimizer update happened (iteration counter advanced once)
    assert trainer.num_iterations == 2
    assert trainer.variables is not None


def test_accum_composes_with_spatial_sharding(train_config, tmpdir):
    """grad_accum_steps under spatial (D-axis) sharding equals the plain
    accumulation run: the D-sharded microbatch step is exactly the unsharded
    computation (test_spatial), so the composed accumulation must be too."""
    paths = _make_data(tmpdir)

    np.random.seed(99)
    cfg_sp = _configure(_copy_cfg(train_config), tmpdir, paths, batch_size=1, accum=2, tag="sp_accum")
    cfg_sp["trainer"]["spatial_sharding"] = True
    trainer_sp = create_trainer(cfg_sp)
    trainer_sp.fit()
    assert trainer_sp.mesh is not None and trainer_sp.mesh.devices.size > 1

    np.random.seed(99)
    cfg_pl = _configure(_copy_cfg(train_config), tmpdir, paths, batch_size=1, accum=2, tag="plain_accum")
    trainer_pl = create_trainer(cfg_pl)
    trainer_pl.fit()
    assert trainer_pl.num_iterations == trainer_sp.num_iterations

    params_sp = jax.tree_util.tree_leaves(jax.device_get(trainer_sp.variables["params"]))
    params_pl = jax.tree_util.tree_leaves(jax.device_get(trainer_pl.variables["params"]))
    for ps, pp in zip(params_sp, params_pl):
        # D-sharded conv/GN reductions legitimately reorder fp sums
        np.testing.assert_allclose(ps, pp, atol=5e-5, rtol=1e-4)
