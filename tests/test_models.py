"""Forward-shape and output-range checks for all model variants.

Mirrors the reference test strategy (tests/test_models.py): shape parity,
probabilities in [0, 1], and the ResNet-block channel-projection cases.
"""

import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.models import get_model, is_model_2d
from pytorch3dunet_tpu.models.blocks import ResNetBlock


@pytest.mark.parametrize(
    "model_name,is3d",
    [
        ("UNet3D", True),
        ("ResidualUNet3D", True),
        ("ResidualUNetSE3D", True),
        ("UNet2D", False),
        ("ResidualUNet2D", False),
    ],
)
def test_model_forward(model_name, is3d):
    cfg = {
        "name": model_name,
        "in_channels": 1,
        "out_channels": 2,
        "f_maps": 8,
        "num_groups": 4,
        "final_sigmoid": True,
        "num_levels": 3,
    }
    model = get_model(cfg)
    assert is_model_2d(model) == (not is3d)

    spatial = (16, 32, 32) if is3d else (32, 32)
    x = np.random.RandomState(7).rand(1, *spatial, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=spatial)
    probs, logits = model.apply(variables, x)

    assert probs.shape == (1, *spatial, 2)
    assert logits.shape == probs.shape
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0


def test_softmax_final_activation():
    cfg = {
        "name": "UNet3D",
        "in_channels": 1,
        "out_channels": 3,
        "f_maps": 8,
        "num_groups": 4,
        "final_sigmoid": False,
        "num_levels": 2,
    }
    model = get_model(cfg)
    x = np.random.RandomState(3).rand(2, 8, 16, 16, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
    probs, _ = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0, atol=1e-5)


def test_regression_mode_returns_logits():
    cfg = {
        "name": "UNet3D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": 8,
        "num_groups": 4,
        "is_segmentation": False,
        "num_levels": 2,
    }
    model = get_model(cfg)
    x = np.random.RandomState(3).rand(1, 8, 16, 16, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
    probs, logits = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(probs), np.asarray(logits))


@pytest.mark.parametrize("in_channels,out_channels", [(8, 16), (16, 16), (16, 8)])
def test_resnet_block_channel_projection(in_channels, out_channels):
    block = ResNetBlock(out_channels=out_channels, num_groups=4, spatial_rank=3)
    x = np.random.RandomState(1).rand(1, 8, 8, 8, in_channels).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(variables, x)
    assert y.shape == (1, 8, 8, 8, out_channels)


def test_anisotropic_pooling():
    # pool_kernel_size (1, 2, 2) keeps z-resolution, as used by anisotropic configs
    cfg = {
        "name": "UNet3D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": 8,
        "num_groups": 4,
        "num_levels": 3,
        "pool_kernel_size": [1, 2, 2],
    }
    model = get_model(cfg)
    x = np.random.RandomState(3).rand(1, 4, 32, 32, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32))
    probs, _ = model.apply(variables, x)
    assert probs.shape == (1, 4, 32, 32, 1)


def test_residual_unet_anisotropic_kernel():
    """ResNet blocks must pad each axis by its own (k-1)//2: a [1, 3, 3]
    kernel previously zero-padded every axis and crashed on the residual add."""
    import jax

    from pytorch3dunet_tpu.models import get_model

    model = get_model({"name": "ResidualUNet3D", "in_channels": 1, "out_channels": 2,
                       "f_maps": 8, "num_groups": 4, "num_levels": 2,
                       "conv_kernel_size": [1, 3, 3], "conv_padding": [0, 1, 1],
                       "final_sigmoid": False})
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(4, 16, 16))
    probs, logits = model.apply(variables, model.example_input((4, 16, 16)))
    assert logits.shape == (1, 4, 16, 16, 2)


def test_se_guard_is_identity_and_present():
    """The SE fusion guard (models/se.py:_guard) must not change values, and
    the barrier must actually appear in the traced graph: on TPU/bf16 the SE
    gate multiply fused into the pooling backward miscompiles whole
    param-grad leaves (BENCH_NOTES r5 SE dossier); the barrier is the fix."""
    import jax.numpy as jnp

    import pytorch3dunet_tpu.models.se as se_mod

    cfg = {
        "name": "ResidualUNetSE3D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": 8,
        "num_groups": 4,
        "num_levels": 2,
        "final_sigmoid": True,
    }
    model = get_model(cfg)
    x = np.random.RandomState(11).rand(1, 8, 16, 16, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
    probs_guarded, _ = model.apply(variables, x)

    # the barrier is in the graph (forward AND the grad graph keep it)
    jaxpr = jax.make_jaxpr(lambda v: model.apply(v, x)[0].sum())(variables)
    assert "optimization_barrier" in str(jaxpr)

    # identity on the values: monkeypatch the guard away and compare
    orig = se_mod._guard
    se_mod._guard = lambda t: t
    try:
        probs_plain, _ = model.apply(variables, x)
    finally:
        se_mod._guard = orig
    np.testing.assert_array_equal(np.asarray(probs_guarded), np.asarray(probs_plain))


def test_se_flat_and_blocked_squeeze_paths_agree():
    """The two P3DUNET_SE squeeze formulations (flat: (N,S,C)-view reduction
    + channel-dot sSE gate; blocked: spatial-axes mean + C=1 conv) must share
    one parameter tree and compute the same function (BENCH_NOTES r5)."""
    import os

    import jax

    cfg = {"name": "ResidualUNetSE3D", "in_channels": 1, "out_channels": 1,
           "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True}
    x = np.random.RandomState(3).rand(1, 8, 16, 16, 1).astype(np.float32)
    model = get_model(cfg)
    prev = os.environ.get("P3DUNET_SE")
    try:
        os.environ["P3DUNET_SE"] = "blocked"
        v_blocked = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
        p_blocked, _ = model.apply(v_blocked, x)
        os.environ["P3DUNET_SE"] = "flat"
        v_flat = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
        assert (jax.tree_util.tree_structure(v_blocked)
                == jax.tree_util.tree_structure(v_flat))
        assert all(a.shape == b.shape for a, b in zip(
            jax.tree_util.tree_leaves(v_blocked), jax.tree_util.tree_leaves(v_flat)))
        p_flat, _ = model.apply(v_blocked, x)  # same params, flat compute path
    finally:
        if prev is None:
            os.environ.pop("P3DUNET_SE", None)
        else:
            os.environ["P3DUNET_SE"] = prev
    np.testing.assert_allclose(np.asarray(p_flat), np.asarray(p_blocked),
                               atol=2e-6, rtol=0)


def test_dense_batchnorm_matches_flax(monkeypatch):
    """P3DUNET_DENSE_BN=1 (compute-dtype apply) == the flax BatchNorm path in
    fp32: train/eval outputs, running-stat updates, grads, same variable tree."""
    import jax.numpy as jnp
    import numpy as np

    from pytorch3dunet_tpu.models.blocks import SingleConv

    m = SingleConv(8, order="bcr", spatial_rank=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))

    monkeypatch.setenv("P3DUNET_DENSE_BN", "1")
    v1 = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("P3DUNET_DENSE_BN", "0")
    v0 = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    outs = {}
    for dense in ("1", "0"):
        monkeypatch.setenv("P3DUNET_DENSE_BN", dense)
        out_eval = m.apply(v0, x)
        out_train, state = m.apply(v0, x, train=True, mutable=["batch_stats"])
        grads = jax.grad(
            lambda p: (m.apply({**v0, "params": p}, x, train=True, mutable=["batch_stats"])[0] ** 2).sum()
        )(v0["params"])
        outs[dense] = (out_eval, out_train, state, grads)
    # the folded affine (a*x + b) reassociates the flax elementwise chain:
    # bit-level differences are ~1e-6 relative in fp32
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"]), jax.tree_util.tree_leaves(outs["0"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
