"""Spatial (depth-axis) model parallelism: sharded training must reproduce
the unsharded computation exactly (halo-exchanged convs, psum'd GroupNorm
stats, loss on gathered logits -> psum'd gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch3dunet_tpu.losses import BCEDiceLoss
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.parallel.spatial import (
    build_spatial_train_step,
    replicate_spatial,
    shard_spatial_batch,
    space_mesh,
    spatial_shardable,
)

CFG = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
       "num_groups": 4, "num_levels": 2, "layer_order": "gcr", "final_sigmoid": True}
PATCH = (64, 16, 16)


def test_spatial_shardable():
    assert spatial_shardable(64, 4, 8)
    assert spatial_shardable(80, 4, 2)
    assert not spatial_shardable(80, 4, 8)  # 10 planes at level 3 don't split 8 ways
    assert spatial_shardable(10, 1, 1)
    # odd mid-pyramid depth: the real encoder floor-pools (crops the global
    # trailing plane); per-shard cropping would silently diverge
    assert not spatial_shardable(36, 4, 3)  # 36 -> 18 -> 9 (odd) -> floor-pool
    # deconv models need >= 2 local planes (2-plane halo in the index fix-up)
    assert spatial_shardable(64, 4, 8, min_local=1)
    assert not spatial_shardable(64, 4, 8, min_local=2)  # bottleneck local = 1
    assert spatial_shardable(64, 4, 4, min_local=2)


def _setup():
    model = get_model(dict(CFG))
    variables = model.init(jax.random.PRNGKey(0), patch_shape=PATCH)
    # SGD: linear in the gradients, so fp reduction-order noise stays ~1e-8
    # (Adam's first-step normalization amplifies 1e-7 grad noise to ~lr)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(variables["params"])
    loss = BCEDiceLoss()
    rs = np.random.RandomState(7)
    x = rs.rand(1, *PATCH, 1).astype(np.float32)
    y = (rs.rand(1, *PATCH, 1) > 0.5).astype(np.float32)
    return model, variables, tx, opt_state, loss, x, y


def _single_device_step(model, variables, tx, opt_state, loss_criterion, x, y):
    def loss_fn(params):
        probs, logits = model.module.apply({"params": params}, x, train=True,
                                           rngs={"dropout": jax.random.PRNGKey(1)})
        return loss_criterion(logits, y), probs

    (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    return optax.apply_updates(variables["params"], updates), float(loss), np.asarray(probs)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_spatial_step_matches_single_device(n_shards):
    assert jax.device_count() >= n_shards
    model, variables, tx, opt_state, loss, x, y = _setup()

    ref_params, ref_loss, ref_probs = _single_device_step(
        model, variables, tx, opt_state, loss, jnp.asarray(x), jnp.asarray(y)
    )

    mesh = space_mesh(n_shards)
    step = build_spatial_train_step(model, loss, tx, mesh)
    vs = replicate_spatial(mesh, variables)
    os_ = replicate_spatial(mesh, tx.init(variables["params"]))
    xi, yi = shard_spatial_batch(mesh, (x, y))
    new_vs, _, sp_loss, sp_probs = step(vs, os_, jax.random.PRNGKey(1), xi, yi)

    assert np.isfinite(float(sp_loss))
    np.testing.assert_allclose(float(sp_loss), ref_loss, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.device_get(sp_probs)), ref_probs, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(new_vs["params"])),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_spatial_forward_only_probs_sharded():
    """The step's probs output stays sharded on D (no gather of the big map)."""
    model, variables, tx, opt_state, loss, x, y = _setup()
    mesh = space_mesh(4)
    step = build_spatial_train_step(model, loss, tx, mesh)
    vs = replicate_spatial(mesh, variables)
    os_ = replicate_spatial(mesh, opt_state)
    xi, yi = shard_spatial_batch(mesh, (x, y))
    _, _, _, probs = step(vs, os_, jax.random.PRNGKey(0), xi, yi)
    assert probs.shape == (1, *PATCH, 1)


def test_dp_sp_composed_matches_single_device():
    """2-D mesh (batch over 'data' x D over 'space'): one composed train step
    equals the single-device step on the same global batch."""
    from pytorch3dunet_tpu.parallel.spatial import (
        build_dp_sp_train_step, dp_sp_mesh, shard_dp_sp_batch,
    )

    model = get_model(dict(CFG))
    variables = model.init(jax.random.PRNGKey(0), patch_shape=PATCH)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(variables["params"])
    loss = BCEDiceLoss()
    rs = np.random.RandomState(3)
    x = rs.rand(2, *PATCH, 1).astype(np.float32)  # batch 2
    y = (rs.rand(2, *PATCH, 1) > 0.5).astype(np.float32)

    ref_params, ref_loss, _ = _single_device_step(
        model, variables, tx, opt_state, loss, jnp.asarray(x), jnp.asarray(y)
    )

    mesh = dp_sp_mesh(2, 4)  # 2 batch shards x 4 spatial shards = 8 devices
    step = build_dp_sp_train_step(model, loss, tx, mesh)
    vs = replicate_spatial(mesh, variables)
    os_ = replicate_spatial(mesh, tx.init(variables["params"]))
    xi, yi = shard_dp_sp_batch(mesh, (x, y))
    new_vs, _, sp_loss, probs = step(vs, os_, jax.random.PRNGKey(1), xi, yi)

    assert probs.shape == (2, *PATCH, 1)
    np.testing.assert_allclose(float(sp_loss), ref_loss, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(new_vs["params"])),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("name,order", [("ResidualUNet3D", "cge"), ("ResidualUNetSE3D", "cge")])
def test_spatial_step_resnet_families(name, order):
    """ResNet/SE families under spatial sharding: halo'd deconv upsampling
    with the nearest fix-up gather, psum'd SE squeeze — exact vs unsharded."""
    cfg = {"name": name, "in_channels": 1, "out_channels": 1, "f_maps": 8,
           "num_groups": 4, "num_levels": 2, "layer_order": order, "final_sigmoid": True}
    model = get_model(cfg)
    patch = (32, 12, 12)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=patch)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(variables["params"])
    loss = BCEDiceLoss()
    rs = np.random.RandomState(3)
    x = rs.rand(1, *patch, 1).astype(np.float32)
    y = (rs.rand(1, *patch, 1) > 0.5).astype(np.float32)

    ref_params, ref_loss, ref_probs = _single_device_step(
        model, variables, tx, opt_state, loss, jnp.asarray(x), jnp.asarray(y)
    )

    mesh = space_mesh(2)
    step = build_spatial_train_step(model, loss, tx, mesh)
    vs = replicate_spatial(mesh, variables)
    os_ = replicate_spatial(mesh, tx.init(variables["params"]))
    xi, yi = shard_spatial_batch(mesh, (x, y))
    new_vs, _, sp_loss, sp_probs = step(vs, os_, jax.random.PRNGKey(1), xi, yi)

    np.testing.assert_allclose(float(sp_loss), ref_loss, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.device_get(sp_probs)), ref_probs, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(new_vs["params"])),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_spatial_shardable_anisotropic_pool():
    from pytorch3dunet_tpu.parallel.spatial import spatial_shardable

    # pool (1, 2, 2): D never shrinks, so 8-way sharding of D=40 is exact at
    # every level — the isotropic-pool simulation would wrongly reject it
    assert spatial_shardable(40, 5, 8, pool=1)
    assert not spatial_shardable(40, 5, 8, pool=2)  # 20 % 8 != 0 at level 1


def test_shard_file_paths_fewer_files_than_hosts():
    from pytorch3dunet_tpu.parallel.distributed import shard_file_paths

    files = ["a.h5", "b.h5", "c.h5"]
    shards = [shard_file_paths(files, process_id=i, num_processes=4) for i in range(4)]
    # every host gets data; the deficit host shares ONE file, not the corpus
    assert shards[0] == ["a.h5"] and shards[1] == ["b.h5"] and shards[2] == ["c.h5"]
    assert len(shards[3]) == 1 and shards[3][0] in files
