"""Squeeze-and-Excitation blocks for channels-last 3D tensors.

Same capabilities as the reference (pytorch3dunet/unet3d/se.py): channel SE
(Hu et al., arXiv:1709.01507), spatial SE and concurrent scSE (Roy et al.,
arXiv:1803.02579), re-designed for NDHWC layout: the squeeze reductions and
excitation matmuls map directly onto TPU reductions/MXU without transposes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


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


class SpatialSELayer3D(nn.Module):
    """Spatial squeeze & excitation: 1x1x1 conv to a single-channel spatial gate."""

    num_channels: int
    dtype: jnp.dtype | None = None
    guard_output: bool = True

    @nn.compact
    def __call__(self, x):
        spatial_rank = x.ndim - 2
        gate = nn.Conv(1, kernel_size=(1,) * spatial_rank, dtype=self.dtype, name="conv")(x)
        gate = nn.sigmoid(gate)
        out = x * gate
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
