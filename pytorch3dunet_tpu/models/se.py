"""Squeeze-and-Excitation blocks for channels-last 3D tensors.

Same capabilities as the reference (pytorch3dunet/unet3d/se.py): channel SE
(Hu et al., arXiv:1709.01507), spatial SE and concurrent scSE (Roy et al.,
arXiv:1803.02579), re-designed for NDHWC layout: the squeeze reductions and
excitation matmuls map directly onto TPU reductions/MXU without transposes.

Squeeze-path formulation (`P3DUNET_SE`, BENCH_NOTES r5 family table):
  flat    (default) — the cSE squeeze reduces a flattened (N, S, C) view
            (one long sublane reduction, no (8,22)-blocked intermediates),
            and the sSE gate is a channel dot producing a channel-free
            (N, D, H, W) map instead of a C=1 tensor whose lane padding is
            128x. Same math, same parameter tree.
  blocked — the naive forms (spatial-axes mean; 1x1x1 conv to one channel).
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _se_mode():
    return os.environ.get("P3DUNET_SE", "flat")


def _guard(x):
    """Fusion barrier at the SE output (identity on the values).

    On TPU in bfloat16, letting XLA fuse the SE gate multiply into the
    downstream pooling backward miscompiles: whole param-grad leaves of the
    enclosing encoder come back non-finite (same bad-element count across
    unrelated spatial shapes; fp32 clean; the isolated SE layer clean; an
    alternate pool lowering also clean — BENCH_NOTES r5, SE bf16 dossier).
    `optimization_barrier` pins the SE output as a fusion boundary, which was
    verified CLEAN on-chip at the repro config. Values are bit-identical.
    """
    return jax.lax.optimization_barrier(x)


class ChannelSELayer3D(nn.Module):
    """Channel squeeze & excitation: global-average squeeze + 2-layer MLP gate."""

    num_channels: int
    reduction_ratio: int = 2
    dtype: jnp.dtype | None = None
    guard_output: bool = True  # False only when a wrapper guards for us

    @nn.compact
    def __call__(self, x):
        # x: (N, D, H, W, C); squeeze over spatial dims
        if _se_mode() == "flat":
            # one reduction over a contiguous (N, S, C) view: C stays on the
            # lanes, S runs down the sublanes — no blocked-reshape copies
            squeezed = jnp.mean(x.reshape(x.shape[0], -1, x.shape[-1]), axis=1)
        else:
            squeezed = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (N, C)
        from pytorch3dunet_tpu.parallel.spatial import active_spatial_axis

        sp_axis = active_spatial_axis()
        if sp_axis is not None:
            # spatial model parallelism: the squeeze is GLOBAL over the
            # D-sharded volume; equal shard sizes make pmean-of-means exact
            squeezed = jax.lax.pmean(squeezed, sp_axis)
        reduced = self.num_channels // self.reduction_ratio
        h = nn.Dense(reduced, dtype=self.dtype, name="fc1")(squeezed)
        h = nn.relu(h)
        h = nn.Dense(self.num_channels, dtype=self.dtype, name="fc2")(h)
        gate = nn.sigmoid(h)
        gate = gate.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (self.num_channels,))
        out = x * gate
        return _guard(out) if self.guard_output else out


class _PointwiseGate(nn.Module):
    """1x1x1 conv to ONE channel, computed as a channel dot.

    Parameter tree and initialization match `nn.Conv(1, kernel_size=(1,)*r)`
    exactly (kernel (1,)*r + (C, 1), bias (1,), lecun-normal fan-in C), so
    checkpoints and the torch interop are unaffected — but the output is a
    channel-free (N, *spatial) map: a C=1 channels-last tensor would pad the
    128 vector lanes 128x in HBM and in every fusion that touches it.
    """

    num_channels: int
    spatial_rank: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        kshape = (1,) * self.spatial_rank + (self.num_channels, 1)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        w = kernel.reshape(self.num_channels)
        b = bias[0]
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        return jnp.tensordot(x, w, axes=[[-1], [0]]) + b


class SpatialSELayer3D(nn.Module):
    """Spatial squeeze & excitation: 1x1x1 conv to a single-channel spatial gate."""

    num_channels: int
    dtype: jnp.dtype | None = None
    guard_output: bool = True

    @nn.compact
    def __call__(self, x):
        spatial_rank = x.ndim - 2
        if _se_mode() == "flat":
            gate = _PointwiseGate(self.num_channels, spatial_rank, dtype=self.dtype,
                                  name="conv")(x)
            out = x * nn.sigmoid(gate)[..., None]
        else:
            gate = nn.Conv(1, kernel_size=(1,) * spatial_rank, dtype=self.dtype,
                           name="conv")(x)
            out = x * nn.sigmoid(gate)
        return _guard(out) if self.guard_output else out


class ChannelSpatialSELayer3D(nn.Module):
    """Concurrent channel + spatial SE combined with an element-wise max.

    The two branches run unguarded (their outputs only feed the max, which is
    materialized here anyway); one barrier at the combined output suffices —
    that exact placement is the on-chip-verified leg H.
    """

    num_channels: int
    reduction_ratio: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cse = ChannelSELayer3D(self.num_channels, self.reduction_ratio, dtype=self.dtype,
                               guard_output=False, name="cSE")(x)
        sse = SpatialSELayer3D(self.num_channels, dtype=self.dtype,
                               guard_output=False, name="sSE")(x)
        return _guard(jnp.maximum(cse, sse))
