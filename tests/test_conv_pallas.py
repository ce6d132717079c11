"""Pallas fused conv3d forward: correctness vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3dunet_tpu.ops import conv_pallas


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(conv_pallas, "_INTERPRET", True)


def _ref(x, w, b=None):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    return out if b is None else out + b


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 6, 20, 12, 5), 5, 4),
    ((1, 4, 8, 9, 3), 3, 7),   # odd W, tiny D
    ((2, 5, 10, 6, 2), 2, 3),  # batched (lax.map path)
])
def test_fwd_matches_lax_conv(shape, cin, cout):
    rs = np.random.RandomState(sum(shape))
    x = jnp.asarray(rs.rand(*shape).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, 3, cin, cout) * 0.4 - 0.2).astype(np.float32))
    b = jnp.asarray(rs.rand(cout).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv_pallas.conv3d_fwd(x, w, b)), np.asarray(_ref(x, w, b)), atol=2e-6
    )


def test_fwd_without_bias():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(1, 4, 10, 8, 6).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, 3, 6, 8) * 0.4 - 0.2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv_pallas.conv3d_fwd(x, w)), np.asarray(_ref(x, w)), atol=2e-6
    )


def test_supported_gates(monkeypatch):
    monkeypatch.setattr(conv_pallas, "_INTERPRET", False)
    assert conv_pallas.supported((1, 8, 16, 16, 4), (3, 3, 3), (1, 1, 1), backend="tpu")
    assert not conv_pallas.supported((1, 8, 16, 16, 4), (1, 1, 1), (0, 0, 0), backend="tpu")
    assert not conv_pallas.supported((1, 8, 16, 16, 4), (3, 3, 3), (1, 1, 1), backend="cpu")
    assert not conv_pallas.supported((1, 1, 16, 16, 4), (3, 3, 3), (1, 1, 1), backend="tpu")


def test_bf16_accumulates_in_f32():
    # a constant field where bf16 accumulation of 27 taps would visibly drift
    x = jnp.full((1, 6, 10, 10, 16), 1.001, jnp.bfloat16)
    w = jnp.full((3, 3, 3, 16, 4), 0.01, jnp.bfloat16)
    got = np.asarray(conv_pallas.conv3d_fwd(x, w), dtype=np.float32)
    ref = np.asarray(_ref(x.astype(jnp.float32), w.astype(jnp.float32)), dtype=np.float32)
    # interior voxels: 27 * 16 * 0.01 * 1.001 ~ 4.32; bf16 output rounding only
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(got[interior], ref[interior], rtol=2e-2)


@pytest.mark.parametrize("variant", ["roll", "packw", "im2col"])
def test_fwd_variants_match(variant):
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.rand(1, 5, 16, 10, 6).astype(np.float32) - 0.5)
    w = jnp.asarray((rs.rand(3, 3, 3, 6, 4) * 0.4 - 0.2).astype(np.float32))
    b = jnp.asarray(rs.rand(4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv_pallas.conv3d_fwd(x, w, b, variant=variant)),
        np.asarray(_ref(x, w, b)),
        atol=2e-6,
    )
