"""Fused decoder joining: upsample(2x nearest) + concat + GroupNorm + conv3x3
computed without ever materializing the upsampled or concatenated tensor.

Motivation (v5e trace, tools/traceview.py on the canonical 80x170x170 train
step): the decoder's nearest-upsample broadcast runs at ~60 GB/s (7% of HBM
peak), and the GroupNorm stats/apply passes over the 96-channel concat tensor
are the largest loop fusions in the step. All of it is avoidable:

1. conv3x3 o upsample2x collapses onto the HALF-RES tensor. With nearest
   2x upsampling, each output phase (a,b,c) in {0,1}^3 reads a 2x2x2 window
   of the small tensor with per-dimension pairwise-summed kernel taps:

       out[2i+a] = W[0]*u[2i+a-1] + W[1]*u[2i+a] + W[2]*u[2i+a+1],  u[p]=x[p//2]
       a=0:  W[0]*x[i-1] + (W[1]+W[2])*x[i]
       a=1:  (W[0]+W[1])*x[i] + W[2]*x[i+1]

   27 taps become 8 per phase: a 3.375x FLOP reduction on the up-branch of
   the decoder conv, and the upsample op disappears (its cost moves into a
   single phase-interleave transpose of the conv OUTPUT, F rather than C_up
   channels wide).

2. conv(concat(skip, up)) = conv_skip(skip) + conv_up(up): the concat is a
   channel-split of the kernel, never a materialized tensor.

3. GroupNorm statistics of the concat are exact per-branch sums: every voxel
   of the upsampled tensor appears 8 times, so sum/up = 8*sum/small. Group
   moments are per-channel sums aggregated per group — identical math to
   normalizing the concat (up to fp32 reassociation).

Reference semantics being reproduced: buildingblocks.py:387-493 (Decoder:
InterpolateUpsampling + concat joining + DoubleConv with pre-conv GroupNorm
for conv_layer_order='gcr').
"""

import jax
import jax.numpy as jnp


def _conv2d_valid(xs, w2):
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def collapse_phase_kernels(kernel):
    """(3,3,3,Ci,Co) -> list of 8 phase kernels (2,2,2,Ci,Co), phase order
    (a,b,c) with c fastest. Phase (a,b,c) computes output voxels at
    (2i+a, 2j+b, 2k+c) of conv3x3(upsample2x(x), pad=1)."""

    def collapse(w, axis):
        w0, w1, w2 = (jax.lax.index_in_dim(w, t, axis, keepdims=True) for t in range(3))
        return (
            jnp.concatenate([w0, w1 + w2], axis=axis),  # phase 0: taps {x[i-1], x[i]}
            jnp.concatenate([w0 + w1, w2], axis=axis),  # phase 1: taps {x[i], x[i+1]}
        )

    out = []
    for wa in collapse(kernel, 0):
        for wab in collapse(wa, 1):
            out.extend(collapse(wab, 2))
    return out


def phase_conv_upsampled(xs, kernel):
    """conv3x3(nearest_upsample_2x(xs), padding=1) without materializing the
    upsampled tensor: 8 phase convs with collapsed 2x2x2 kernels, interleaved.

    xs: (N, d, h, w, Ci); kernel: (3, 3, 3, Ci, Co).
    Returns (N, 2d, 2h, 2w, Co).
    """
    N, d, h, w, _ = xs.shape
    F = kernel.shape[-1]
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    phases = []
    kernels = collapse_phase_kernels(kernel)
    i = 0
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                K = kernels[i]
                i += 1
                # window start offset = phase index (xp is padded by 1)
                sl = jax.lax.slice(
                    xp, (0, a, b, c, 0), (N, a + d + 1, b + h + 1, c + w + 1, xs.shape[-1])
                )
                # 2-tap depth decomposition of the 2x2x2 VALID conv
                o = None
                for dz in range(2):
                    s2 = sl[:, dz : dz + d].reshape(N * d, h + 1, w + 1, xs.shape[-1])
                    t = _conv2d_valid(s2, K[dz])
                    o = t if o is None else o + t
                phases.append(o.reshape(N, d, h, w, F))
    out = jnp.stack(phases, axis=0).reshape(2, 2, 2, N, d, h, w, F)
    out = out.transpose(3, 4, 0, 5, 1, 6, 2, 7).reshape(N, 2 * d, 2 * h, 2 * w, F)
    return out


def concat_group_stats(skip, xs, num_groups, eps=1e-5):
    """GroupNorm statistics of concat([skip, upsample2x(xs)], -1) computed
    per-branch in fp32. Returns per-channel (scale-free) (mean_c_group,
    inv_std_c_group) broadcast back to each channel: shapes (N, C).

    Exact: each xs voxel appears 2^3 times in the upsampled tensor, so its
    per-channel sums scale by 8.
    """
    N, D, H, W, Cs = skip.shape
    Cu = xs.shape[-1]
    C = Cs + Cu
    assert C % num_groups == 0
    gs = C // num_groups
    V = D * H * W

    s32 = skip.astype(jnp.float32)
    x32 = xs.astype(jnp.float32)
    sum_s = s32.sum(axis=(1, 2, 3))
    sumsq_s = (s32 * s32).sum(axis=(1, 2, 3))
    sum_u = 8.0 * x32.sum(axis=(1, 2, 3))
    sumsq_u = 8.0 * (x32 * x32).sum(axis=(1, 2, 3))

    sums = jnp.concatenate([sum_s, sum_u], axis=-1).reshape(N, num_groups, gs).sum(-1)
    sumsqs = jnp.concatenate([sumsq_s, sumsq_u], axis=-1).reshape(N, num_groups, gs).sum(-1)
    mean_g = sums / (V * gs)
    var_g = sumsqs / (V * gs) - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    return mean_c, inv_c


def fused_up_concat_conv(
    skip,
    xs,
    kernel,
    *,
    num_groups=None,
    gn_scale=None,
    gn_bias=None,
    conv_bias=None,
    dtype=None,
    eps=1e-5,
):
    """[optional GroupNorm] + conv3x3(pad=1) over concat([skip, up2x(xs)], -1),
    fused: no upsampled tensor, no concat, per-branch GN.

    skip: (N, 2d, 2h, 2w, Cs); xs: (N, d, h, w, Cu);
    kernel: (3, 3, 3, Cs+Cu, Co) — the SAME parameter a plain concat conv uses.
    When num_groups is given, gn_scale/gn_bias are the (Cs+Cu,) GroupNorm
    affine params applied BEFORE the conv (layer_order 'gc...').
    Returns (N, 2d, 2h, 2w, Co).
    """
    Cs = skip.shape[-1]
    N = skip.shape[0]

    if num_groups is not None:
        mean_c, inv_c = concat_group_stats(skip, xs, num_groups, eps)
        a_c = inv_c * gn_scale[None, :]
        b_c = gn_bias[None, :] - mean_c * a_c
        bshape = (N, 1, 1, 1, -1)
        skip = skip.astype(jnp.float32) * a_c[:, :Cs].reshape(bshape) + b_c[:, :Cs].reshape(bshape)
        xs = xs.astype(jnp.float32) * a_c[:, Cs:].reshape(bshape) + b_c[:, Cs:].reshape(bshape)

    if dtype is not None:
        skip = skip.astype(dtype)
        xs = xs.astype(dtype)
        kernel = kernel.astype(dtype)
    else:
        kernel = kernel.astype(skip.dtype)
        xs = xs.astype(skip.dtype)

    from pytorch3dunet_tpu.ops.conv import _as2d

    out = _as2d(skip, kernel[:, :, :, :Cs, :], (3, 3, 3, 1, 1, 1))
    out = out + phase_conv_upsampled(xs, kernel[:, :, :, Cs:, :])
    if conv_bias is not None:
        out = out + conv_bias.astype(out.dtype)
    return out
