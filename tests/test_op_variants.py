"""Opt-in op formulations must match the defaults exactly (they are pure
performance alternates, selected by env flags; see BENCH_NOTES.md r2)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.ops import interp


def _model_and_data():
    model = get_model({
        "name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
        "num_levels": 2, "layer_order": "gcr", "num_groups": 4,
    })
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 8, 16, 16, 1).astype(np.float32))
    y = jnp.asarray((rs.rand(1, 8, 16, 16, 1) > 0.5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), patch_shape=(8, 16, 16))
    return model, variables, x, y


def _loss_and_grads(model, variables, x, y):
    def loss_fn(p):
        _, logits = model.module.apply({"params": p}, x)
        return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), jax.tree_util.tree_leaves(grads)


def test_tapfold_optin_matches_default(monkeypatch):
    model, variables, x, y = _model_and_data()
    monkeypatch.setenv("P3DUNET_TAPFOLD", "0")
    l0, g0 = _loss_and_grads(model, variables, x, y)
    monkeypatch.setenv("P3DUNET_TAPFOLD", "1")
    l1, g1 = _loss_and_grads(model, variables, x, y)
    np.testing.assert_allclose(l1, l0, atol=1e-6)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dense_gn_optin_matches_default(monkeypatch):
    model, variables, x, y = _model_and_data()
    monkeypatch.setenv("P3DUNET_DENSE_GN", "0")
    l0, g0 = _loss_and_grads(model, variables, x, y)
    monkeypatch.setenv("P3DUNET_DENSE_GN", "1")
    l1, g1 = _loss_and_grads(model, variables, x, y)
    np.testing.assert_allclose(l1, l0, atol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_upsample2_broadcast_matches_repeat(monkeypatch):
    x = jnp.asarray(np.random.RandomState(1).rand(2, 3, 4, 5, 6).astype(np.float32))
    monkeypatch.setenv("P3DUNET_UP2X", "repeat")
    a = interp.nearest_upsample_int(x, (2, 2, 2))
    monkeypatch.setenv("P3DUNET_UP2X", "bc")
    b = interp.nearest_upsample_int(x, (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
