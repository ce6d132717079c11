"""Fused GroupNorm(+activation) with Pallas reduction kernels and a custom VJP.

Why: XLA lowers the GroupNorm statistics (bf16 -> fp32 sum reductions) and the
backward dgamma/dbeta reductions to slow convert_reduce fusions (~6.6 ms/step
in the UNet3D train step on v5e). The Pallas kernels here stream the tensor
once in its NATIVE (N, D, H, W, C) layout — an earlier flattened (N, M, C)
variant triggered ~30 ms/step of HBM re-tiling copies, so the kernels now
block over (D, H) directly and no reshape ever touches the big tensor.

Forward kernel: per-channel {sum, sum-of-squares}. Backward kernel:
per-channel {sum dz, sum dz*xhat} with dz = dy * act'(z) recomputed on the
fly. Group statistics reduce over the tiny (C,) vectors in jnp; all remaining
elementwise math stays in jnp where XLA fuses it into neighbors.

The optional fused activation covers the `cge`/`cgr`/`cgl` layer orders where
an activation directly follows the norm; `gcr` uses act='none'.

Numerics: biased variance, eps inside the sqrt — torch GroupNorm parity.
On non-TPU backends a pure-jnp reference implementation is used.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to exercise the Pallas kernels in interpreter mode on CPU
_INTERPRET = False


def _act_fn(act: str):
    if act == "none":
        return lambda z: z
    if act == "relu":
        return jax.nn.relu
    if act == "elu":
        return jax.nn.elu
    if act == "leaky01":
        return partial(jax.nn.leaky_relu, negative_slope=0.01)
    if act == "leaky10":
        return partial(jax.nn.leaky_relu, negative_slope=0.1)
    raise ValueError(f"unknown act: {act}")


def _act_grad_mask(act: str, z):
    """d act(z) / dz as a function of the pre-activation z."""
    if act == "none":
        return jnp.ones_like(z)
    if act == "relu":
        return (z > 0).astype(z.dtype)
    if act == "elu":
        return jnp.where(z > 0, 1.0, jnp.exp(z))
    if act == "leaky01":
        return jnp.where(z > 0, 1.0, 0.01)
    if act == "leaky10":
        return jnp.where(z > 0, 1.0, 0.1)
    raise ValueError(f"unknown act: {act}")


def _use_pallas():
    return _INTERPRET or jax.default_backend() == "tpu"


def _choose_th(h: int, w: int, c: int, budget_bytes: int):
    """Rows of H per block: a divisor of H keeping the VMEM block under budget
    (lane dim padded to 128, sublane dim W padded to 8)."""
    lane = ((c + 127) // 128) * 128
    w_pad = ((w + 7) // 8) * 8
    per_row = 2 * w_pad * lane
    cap = max(1, budget_bytes // per_row)
    for th in range(min(h, cap), 0, -1):
        if h % th == 0:
            return th
    return None


# ---------------------------------------------------------------------------
# Pallas reduction kernels (native 5D layout, grid over N x D x H-tiles)
# ---------------------------------------------------------------------------


def _sums_kernel(x_ref, out_ref, acc_ref):
    d = pl.program_id(1)
    h = pl.program_id(2)

    @pl.when((d == 0) & (h == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0, 0].astype(jnp.float32)  # (TH, W, C)
    acc_ref[0:1, :] += jnp.sum(xb, axis=(0, 1))[None, :]
    acc_ref[1:2, :] += jnp.sum(xb * xb, axis=(0, 1))[None, :]

    @pl.when((d == pl.num_programs(1) - 1) & (h == pl.num_programs(2) - 1))
    def _():
        out_ref[0] = acc_ref[...]


def _channel_sums(x):
    """x: (N, D, H, W, C) -> (N, 2, C) fp32 [sum, sumsq] per channel."""
    n, d, h, w, c = x.shape
    th = _choose_th(h, w, c, budget_bytes=1024 * 1024)
    if th is None:
        return None
    grid = (n, d, h // th)
    return pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, th, w, c), lambda i, j, k: (i, j, k, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j, k: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_INTERPRET,
    )(x)


def _bwd_sums_kernel(x_ref, dy_ref, mean_ref, rstd_ref, gamma_ref, beta_ref, out_ref, acc_ref, *, act):
    d = pl.program_id(1)
    h = pl.program_id(2)

    @pl.when((d == 0) & (h == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0, 0].astype(jnp.float32)  # (TH, W, C)
    dyb = dy_ref[0, 0].astype(jnp.float32)
    mean = mean_ref[0][None, :]  # broadcast (C,) over (TH, W)
    rstd = rstd_ref[0][None, :]
    gamma = gamma_ref[0][None, :]
    beta = beta_ref[0][None, :]

    xhat = (xb - mean) * rstd
    z = xhat * gamma + beta
    dz = dyb * _act_grad_mask(act, z)

    acc_ref[0:1, :] += jnp.sum(dz, axis=(0, 1))[None, :]
    acc_ref[1:2, :] += jnp.sum(dz * xhat, axis=(0, 1))[None, :]

    @pl.when((d == pl.num_programs(1) - 1) & (h == pl.num_programs(2) - 1))
    def _():
        out_ref[0] = acc_ref[...]


def _bwd_channel_sums(x, dy, mean_c, rstd_c, gamma, beta, act):
    """x, dy: (N, D, H, W, C); mean_c/rstd_c/gamma/beta: (N, C).
    Returns (N, 2, C) fp32 [sum dz, sum dz*xhat]."""
    n, d, h, w, c = x.shape
    th = _choose_th(h, w, c, budget_bytes=512 * 1024)
    if th is None:
        return None
    grid = (n, d, h // th)
    big = pl.BlockSpec((1, 1, th, w, c), lambda i, j, k: (i, j, k, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i, j, k: (i, 0))
    return pl.pallas_call(
        partial(_bwd_sums_kernel, act=act),
        grid=grid,
        in_specs=[big, big, vec, vec, vec, vec],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j, k: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_INTERPRET,
    )(x, dy, mean_c, rstd_c, gamma, beta)


# ---------------------------------------------------------------------------
# fused op with custom VJP
# ---------------------------------------------------------------------------


def _as_5d(x):
    """Canonicalizes (N, *spatial, C) to (N, D, H, W, C); for the supported
    model ranks this is metadata-only (no data movement)."""
    if x.ndim == 5:
        return x
    n, c = x.shape[0], x.shape[-1]
    if x.ndim == 4:  # (N, H, W, C) -> depth 1
        return x.reshape(n, 1, x.shape[1], x.shape[2], c)
    m = int(np.prod(x.shape[1:-1]))
    return x.reshape(n, 1, 1, m, c)


def _jnp_stats(x, num_groups, eps):
    n, c = x.shape[0], x.shape[-1]
    m = int(np.prod(x.shape[1:-1]))
    cg = c // num_groups
    xf = x.reshape(n, m, num_groups, cg).astype(jnp.float32)
    mean_g = xf.mean(axis=(1, 3))
    var_g = jnp.square(xf).mean(axis=(1, 3)) - mean_g**2
    rstd_g = jax.lax.rsqrt(var_g + eps)
    return jnp.repeat(mean_g, cg, axis=1), jnp.repeat(rstd_g, cg, axis=1)


def _stats(x, num_groups, eps):
    """Returns per-channel (mean_c, rstd_c), each (N, C) fp32."""
    c = x.shape[-1]
    cg = c // num_groups
    if _use_pallas():
        sums = _channel_sums(_as_5d(x))
        if sums is not None:
            n = x.shape[0]
            m = int(np.prod(x.shape[1:-1]))
            grouped = sums.reshape(n, 2, num_groups, cg).sum(axis=3)
            count = m * cg
            mean_g = grouped[:, 0] / count
            var_g = grouped[:, 1] / count - mean_g * mean_g
            rstd_g = jax.lax.rsqrt(var_g + eps)
            return jnp.repeat(mean_g, cg, axis=1), jnp.repeat(rstd_g, cg, axis=1)
    return _jnp_stats(x, num_groups, eps)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_act(x, gamma, beta, num_groups, eps=1e-5, act="none"):
    """GroupNorm with torch semantics + optional fused activation."""
    y, _ = _fwd(x, gamma, beta, num_groups, eps, act)
    return y


def _fwd(x, gamma, beta, num_groups, eps, act):
    mean_c, rstd_c = _stats(x, num_groups, eps)

    # elementwise apply: XLA fuses this into the surrounding ops
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    scale = (rstd_c * gamma[None, :]).reshape(bshape)
    shift = (beta[None, :] - mean_c * rstd_c * gamma[None, :]).reshape(bshape)
    z = x.astype(jnp.float32) * scale + shift
    y = _act_fn(act)(z).astype(x.dtype)
    return y, (x, gamma, beta, mean_c, rstd_c)


def _bwd(num_groups, eps, act, residuals, dy):
    x, gamma, beta, mean_c, rstd_c = residuals
    n, c = x.shape[0], x.shape[-1]
    m = int(np.prod(x.shape[1:-1]))
    cg = c // num_groups

    sums = None
    if _use_pallas():
        sums = _bwd_channel_sums(
            _as_5d(x), _as_5d(dy), mean_c, rstd_c,
            jnp.broadcast_to(gamma.astype(jnp.float32)[None, :], (n, c)),
            jnp.broadcast_to(beta.astype(jnp.float32)[None, :], (n, c)),
            act,
        )
    if sums is not None:
        c1 = sums[:, 0]  # (N, C): sum dz
        c2 = sums[:, 1]  # (N, C): sum dz * xhat
    else:
        xf = x.reshape(n, m, c).astype(jnp.float32)
        dyf = dy.reshape(n, m, c).astype(jnp.float32)
        xhat = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
        z = xhat * gamma[None, None, :] + beta[None, None, :]
        dz = dyf * _act_grad_mask(act, z)
        c1 = dz.sum(axis=1)
        c2 = (dz * xhat).sum(axis=1)

    dgamma = c2.sum(axis=0).astype(gamma.dtype)
    dbeta = c1.sum(axis=0).astype(beta.dtype)

    # per-group means of dxhat and dxhat*xhat (dxhat = dz * gamma)
    gamma_f = gamma.astype(jnp.float32)[None, :]
    s1_g = (c1 * gamma_f).reshape(n, num_groups, cg).sum(axis=2)  # (N, G)
    s2_g = (c2 * gamma_f).reshape(n, num_groups, cg).sum(axis=2)
    count = m * cg
    mean_dxhat = jnp.repeat(s1_g / count, cg, axis=1)  # (N, C)
    mean_dxhat_xhat = jnp.repeat(s2_g / count, cg, axis=1)

    # elementwise dx (fused by XLA); recompute xhat and dz on the fly
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    mean_b = mean_c.reshape(bshape)
    rstd_b = rstd_c.reshape(bshape)
    gamma_b = gamma_f.reshape((1,) * (x.ndim - 1) + (c,))
    beta_b = beta.astype(jnp.float32).reshape((1,) * (x.ndim - 1) + (c,))

    xf = x.astype(jnp.float32)
    xhat = (xf - mean_b) * rstd_b
    z = xhat * gamma_b + beta_b
    dz = dy.astype(jnp.float32) * _act_grad_mask(act, z)
    dx = rstd_b * (dz * gamma_b - mean_dxhat.reshape(bshape) - xhat * mean_dxhat_xhat.reshape(bshape))
    return dx.astype(x.dtype), dgamma, dbeta


def _fwd_vjp(x, gamma, beta, num_groups, eps, act):
    y, res = _fwd(x, gamma, beta, num_groups, eps, act)
    return y, res


group_norm_act.defvjp(_fwd_vjp, _bwd)
