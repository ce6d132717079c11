"""Lane-packed activation layout (ops/packed.py): per-op equivalence against
the unpacked reference ops, plus full-model packed-vs-unpacked forward/grad
equivalence for every model family. The packed layout must be a pure
performance change — numerics identical up to reduction-order noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.ops import packed as P
from pytorch3dunet_tpu.ops import pool as pool_ops
from pytorch3dunet_tpu.ops.interp import nearest_upsample_int, resize_spatial


def _rand(*shape):
    return jnp.asarray(np.random.RandomState(sum(shape)).rand(*shape).astype(np.float32))


def test_pack_unpack_roundtrip():
    x = _rand(2, 4, 6, 10, 3)
    p = P.pack(x)
    assert p.data.shape == (2, 4, 6, 30)
    assert p.channels == 3 and p.width == 10
    assert p.shape == x.shape
    np.testing.assert_array_equal(P.unpack(p), x)


def test_packed_group_norm_matches_flax():
    import flax.linen as nn

    x = _rand(2, 4, 6, 10, 16)
    scale = _rand(16) + 0.5
    bias = _rand(16) - 0.5
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = P.unpack(P.group_norm_act(P.pack(x), scale, bias, 4, 1e-5, "none"))
    np.testing.assert_allclose(got, ref, atol=5e-5)

    # fused activation path
    ref_relu = jax.nn.relu(ref)
    got_relu = P.unpack(P.group_norm_act(P.pack(x), scale, bias, 4, 1e-5, "relu"))
    np.testing.assert_allclose(got_relu, ref_relu, atol=5e-5)


@pytest.mark.parametrize("window", [(2, 2, 2), (1, 2, 2), (3, 3, 3)])
def test_packed_pools_match_unpacked(window):
    x = _rand(2, 6, 9, 12, 8)
    for packed_fn, ref_fn in [(P.max_pool, pool_ops.max_pool), (P.avg_pool, pool_ops.avg_pool)]:
        got = P.unpack(packed_fn(P.pack(x), window))
        ref = ref_fn(x, window)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_packed_pool_2d():
    x = _rand(2, 9, 12, 8)
    got = P.unpack(P.max_pool(P.pack(x), (2, 2)))
    ref = pool_ops.max_pool(x, (2, 2))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_packed_nearest_upsample_int():
    x = _rand(2, 3, 4, 5, 8)
    got = P.unpack(P.nearest_upsample_int(P.pack(x), (2, 2, 2)))
    ref = nearest_upsample_int(x, (2, 2, 2))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("target", [(6, 8, 10), (5, 7, 9), (3, 4, 5)])
def test_packed_nearest_resize(target):
    x = _rand(2, 3, 4, 5, 8)
    got = P.unpack(P.nearest_resize(P.pack(x), target))
    ref = resize_spatial(x, target, mode="nearest")
    np.testing.assert_array_equal(got, ref)


def test_packed_concat_channels():
    a, b = _rand(2, 3, 4, 5, 8), _rand(2, 3, 4, 5, 4)
    got = P.concat_channels(P.pack(a), P.pack(b))
    assert got.channels == 12
    np.testing.assert_array_equal(P.unpack(got), jnp.concatenate([a, b], axis=-1))


def test_packed_channel_dropout_drops_whole_channels():
    x = jnp.ones((4, 3, 4, 5, 16))
    out = P.unpack(P.channel_dropout(P.pack(x), jax.random.PRNGKey(0), 0.5))
    # each (n, c) fiber is constant: either 0 or 1/keep
    flat = np.asarray(out).reshape(4, -1, 16)
    assert np.all((flat == flat[:, :1, :])), "channel dropout must be constant per channel"
    vals = np.unique(flat.round(6))
    assert set(vals).issubset({0.0, 2.0})


_MODEL_CASES = [
    ("UNet3D", True),
    ("ResidualUNet3D", True),
    ("ResidualUNetSE3D", True),
    ("UNet2D", False),
    ("ResidualUNet2D", False),
]


@pytest.mark.parametrize("name,is3d", _MODEL_CASES)
def test_model_packed_matches_unpacked(name, is3d, monkeypatch):
    model = get_model({
        "name": name,
        "in_channels": 1,
        "out_channels": 2,
        "f_maps": 8,
        "num_levels": 2,
        "final_sigmoid": False,
        "layer_order": "gcr",
        "num_groups": 4,
    })
    shape = (1, 8, 16, 16, 1) if is3d else (1, 16, 16, 1)
    x = _rand(*shape)

    monkeypatch.setenv("P3DUNET_PACKED", "0")
    variables = model.init(jax.random.PRNGKey(0), patch_shape=shape[1:-1])
    probs_u, logits_u = model.apply(variables, x)

    monkeypatch.setenv("P3DUNET_PACKED", "1")
    probs_p, logits_p = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs_p), np.asarray(probs_u), atol=2e-5)


def test_model_packed_grads_match(monkeypatch):
    model = get_model({
        "name": "UNet3D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": 8,
        "num_levels": 2,
        "layer_order": "gcr",
        "num_groups": 4,
    })
    x = _rand(1, 8, 16, 16, 1)
    y = (_rand(1, 8, 16, 16, 1) > 0.5).astype(jnp.float32)

    monkeypatch.setenv("P3DUNET_PACKED", "0")
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))

    def loss_fn(params):
        _, logits = model.module.apply({"params": params}, x, train=False)
        return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)

    gu = jax.grad(loss_fn)(variables["params"])
    monkeypatch.setenv("P3DUNET_PACKED", "1")
    gp = jax.grad(loss_fn)(variables["params"])
    for ku, kp in zip(jax.tree_util.tree_leaves(gu), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(kp), np.asarray(ku), atol=5e-5)


def test_model_packed_dropout_and_batchnorm(monkeypatch):
    """Stochastic/mutable paths run under the packed layout: dropout rngs and
    batch_stats mutation both work."""
    monkeypatch.setenv("P3DUNET_PACKED", "1")
    model = get_model({
        "name": "UNet3D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": 8,
        "num_levels": 2,
        "layer_order": "bcrd",
        "dropout_prob": 0.3,
    })
    x = _rand(1, 8, 16, 16, 1)
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
    (probs, logits), updated = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert "batch_stats" in updated
