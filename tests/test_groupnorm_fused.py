"""Fused GroupNorm(+act) correctness: forward + custom-VJP gradients vs
naive autodiff, in both the jnp path and the Pallas kernels (interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch3dunet_tpu.ops.groupnorm as gn
from pytorch3dunet_tpu.ops.groupnorm import group_norm_act


def _naive(x, gamma, beta, num_groups, eps=1e-5, act="none"):
    n, c = x.shape[0], x.shape[-1]
    m = int(np.prod(x.shape[1:-1]))
    cg = c // num_groups
    xf = x.reshape(n, m, num_groups, cg).astype(jnp.float32)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    xhat = xhat.reshape(n, m, c)
    z = xhat * gamma[None, None, :] + beta[None, None, :]
    from pytorch3dunet_tpu.ops.groupnorm import _act_fn

    return _act_fn(act)(z).reshape(x.shape).astype(x.dtype)


@pytest.fixture(params=[False, True], ids=["jnp", "pallas-interpret"])
def pallas_mode(request):
    old = gn._INTERPRET
    gn._INTERPRET = request.param
    yield request.param
    gn._INTERPRET = old


@pytest.mark.parametrize("act", ["none", "relu", "elu"])
def test_forward_matches_naive(pallas_mode, act):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 7, 6, 8), dtype=jnp.float32)
    gamma = jnp.asarray(rs.rand(8) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rs.randn(8), dtype=jnp.float32)

    got = group_norm_act(x, gamma, beta, 4, 1e-5, act)
    want = _naive(x, gamma, beta, 4, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("act", ["none", "relu", "elu"])
def test_gradients_match_naive(pallas_mode, act):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 6, 6, 8), dtype=jnp.float32)
    gamma = jnp.asarray(rs.rand(8) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rs.randn(8), dtype=jnp.float32)
    cot = jnp.asarray(rs.randn(1, 4, 6, 6, 8), dtype=jnp.float32)

    def loss_fused(x, gamma, beta):
        return jnp.sum(group_norm_act(x, gamma, beta, 4, 1e-5, act) * cot)

    def loss_naive(x, gamma, beta):
        return jnp.sum(_naive(x, gamma, beta, 4, 1e-5, act) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(x, gamma, beta)

    for gf, gn_, name in zip(g_fused, g_naive, ["dx", "dgamma", "dbeta"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn_), atol=3e-4, err_msg=name)


def test_bfloat16_input(pallas_mode):
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 4, 8, 8, 16), dtype=jnp.bfloat16)
    gamma = jnp.ones(16, dtype=jnp.float32)
    beta = jnp.zeros(16, dtype=jnp.float32)
    y = group_norm_act(x, gamma, beta, 4, 1e-5, "relu")
    assert y.dtype == jnp.bfloat16
    yf = np.asarray(y, dtype=np.float32)
    assert yf.min() >= 0  # relu applied
    assert 0.3 < yf[yf > 0].mean() < 1.2  # roughly standardized positives


def test_nonuniform_tile_sizes(pallas_mode):
    # M not a multiple of the kernel tile: padding/masking path
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 3, 5, 7, 4), dtype=jnp.float32)  # M = 105
    gamma = jnp.asarray(rs.rand(4) + 0.5, dtype=jnp.float32)
    beta = jnp.asarray(rs.randn(4), dtype=jnp.float32)
    got = group_norm_act(x, gamma, beta, 2, 1e-5, "none")
    want = _naive(x, gamma, beta, 2, 1e-5, "none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
