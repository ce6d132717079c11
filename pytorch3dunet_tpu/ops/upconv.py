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

import os

import jax
import jax.numpy as jnp

# "phase": 8 separate 2x2x2 phase convs + stack/interleave.
# "wide" (default): one 3x3x3 conv with all 8 phase kernels zero-embedded
#         along Cout (8*Co output channels -> N=256-wide GEMMs on the MXU,
#         3.375x the MACs of "phase") followed by a channel-block
#         depth-to-space. Measured faster end-to-end on v5e (BENCH_NOTES r2).
def _upconv_mode():
    return os.environ.get("P3DUNET_UPCONV", "wide")


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


def _phase_embed(kernels) -> jnp.ndarray:
    """Zero-embeds one kernel per phase (a, b, c | c fastest — the ordering
    contract shared with depth_to_space_blocks) at spatial offsets
    [a:, b:, c:], concatenated along Cout. `kernels` is a list of 8 per-phase
    kernels or ONE kernel used for every phase."""
    blocks = []
    for i, (a, b, c) in enumerate((a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)):
        k = kernels[i] if isinstance(kernels, list) else kernels
        blocks.append(jnp.pad(k, ((a, 1 - a), (b, 1 - b), (c, 1 - c), (0, 0), (0, 0))))
    return jnp.concatenate(blocks, axis=-1)


def embed_wide_kernel(kernel):
    """(3,3,3,Ci,Co) -> (3,3,3,Ci,8*Co): each output-channel block (a,b,c)
    holds that phase's collapsed 2x2x2 kernel zero-embedded at spatial
    offsets [a:a+2, b:b+2, c:c+2]. A single VALID 3^3 conv over the padded
    half-res tensor then produces every upsample phase at once."""
    return _phase_embed(collapse_phase_kernels(kernel))


def depth_to_space_blocks(out, F):
    """(N, d, h, w, 8F) channel-blocked phases (a,b,c | c fastest) ->
    (N, 2d, 2h, 2w, F) interleaved full-res.

    A 'keep (c,F) as one 2F unit, move only a/b' transpose variant measured
    SLOWER end-to-end (23.05 vs 23.93 Mvox/s, v5e) — the full 8-axis form
    below is what XLA lowers best."""
    N, d, h, w, _ = out.shape
    out = out.reshape(N, d, h, w, 2, 2, 2, F)
    return out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(N, 2 * d, 2 * h, 2 * w, F)


def _upconv_wide_blocks(xs, kernel):
    """All 8 upsample phases of conv3x3(up2x(xs)) as one VALID 3^3 conv:
    (N, d, h, w, Ci) -> channel-blocked (N, d, h, w, 8F)."""
    from pytorch3dunet_tpu.ops.conv import _as2d

    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return _as2d(xp, embed_wide_kernel(kernel), (3, 3, 3, 0, 0, 0))


def _phase_conv_upsampled_wide(xs, kernel):
    return depth_to_space_blocks(_upconv_wide_blocks(xs, kernel), kernel.shape[-1])


def embed_wide_kernel_d(kernel):
    """Depth-only phase collapse: (3,3,3,Ci,Co) -> (3,3,3,Ci,2Co).

    For conv3x3 o nearest_up2x_D (H/W already at target resolution):
      out[2i+a] phase a=0 reads {x[i-1]*W0, x[i]*(W1+W2)},
                phase a=1 reads {x[i]*(W0+W1), x[i+1]*W2},
    zero-embedded into the 3-tap depth envelope; H/W taps stay as-is."""
    w0, w1, w2 = kernel[0:1], kernel[1:2], kernel[2:3]
    z = jnp.zeros_like(w0)
    k0 = jnp.concatenate([w0, w1 + w2, z], axis=0)
    k1 = jnp.concatenate([z, w0 + w1, w2], axis=0)
    return jnp.concatenate([k0, k1], axis=-1)


def _upconv_wide_blocks_d(m, kernel):
    """conv3x3(nearest_up2x_D(m), pad=1) for both depth phases at once:
    (N, d, H, W, Ci) -> depth-blocked (N, d, H, W, 2F)."""
    from pytorch3dunet_tpu.ops.conv import _as2d

    return _as2d(m, embed_wide_kernel_d(kernel), (3, 3, 3, 1, 1, 1))


def depth_to_space_blocks_d(out, F):
    """(N, d, H, W, 2F) depth-phase blocks -> (N, 2d, H, W, F)."""
    N, d, H, W, _ = out.shape
    out = out.reshape(N, d, H, W, 2, F)
    return out.transpose(0, 1, 4, 2, 3, 5).reshape(N, 2 * d, H, W, F)


def strided_conv_blocks(x, kernel):
    """conv3x3(x, pad=1) evaluated at every output phase simultaneously:
    ONE stride-2 conv with the 3^3 kernel zero-embedded per phase into a 4^3
    envelope. (N, 2d, 2h, 2w, C) -> channel-blocked (N, d, h, w, 8F).

    Output phase (a,b,c) needs full-res taps 2i+a+delta-1, delta in [0,3);
    in the 4^3 stride-2 window starting at 2i-1 those are offsets [a, a+3)."""
    N, D, H, W, C = x.shape
    F = kernel.shape[-1]
    d = D // 2
    k4 = _phase_embed(kernel)  # (4, 4, 4, C, 8F): same 3^3 kernel per phase

    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
    out = None
    for u in range(4):
        # depth tap u reads padded planes 2i+u, i in [0, d)
        slab = jax.lax.slice_in_dim(xp, u, u + 2 * d - 1, 2, 1).reshape(N * d, H, W, C)
        o = jax.lax.conv_general_dilated(
            slab, k4[u], (2, 2), [(1, 2), (1, 2)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = o if out is None else out + o
    return out.reshape(N, d, H // 2, W // 2, 8 * F)


def phase_conv_upsampled(xs, kernel):
    """conv3x3(nearest_upsample_2x(xs), padding=1) without materializing the
    upsampled tensor: 8 phase convs with collapsed 2x2x2 kernels, interleaved.

    xs: (N, d, h, w, Ci); kernel: (3, 3, 3, Ci, Co).
    Returns (N, 2d, 2h, 2w, Co).
    """
    if _upconv_mode() == "wide":
        return _phase_conv_upsampled_wide(xs, kernel)
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


def collapse_deconv_kernels(kernel):
    """(3,3,3,Ci,Co) -> 8 phase kernels (2,2,2,Ci,Co) for ConvTranspose
    kernel 3 / stride 2 / padding (1,1) (the ResNet-family decoder upsampling,
    reference buildingblocks.py:387-493 TransposeConvUpsampling).

    XLA lowers `conv_transpose` to a conv over the zero-dilated input — the
    input-dilated shape measured catastrophically slow on v5e in BOTH
    directions (BENCH_NOTES r2: stride-2 backward; r5: deconv decoder).
    The same operator decomposes exactly into per-phase REGULAR convs:

        y[2i]   = W[1] x[i]                 (phase 0: taps (x[i-1], x[i]),
                                             kernel (0, W[1]))
        y[2i+1] = W[0] x[i] + W[2] x[i+1]   (phase 1: taps (x[i], x[i+1]),
                                             kernel (W[0], W[2]))

    per axis, composed over the three axes — the transposed-conv analogue of
    `collapse_phase_kernels`, reusing the same wide-embed + depth-to-space
    machinery (and the same regular autodiff backward)."""

    def collapse(w, axis):
        w0, w1, w2 = (jax.lax.index_in_dim(w, t, axis, keepdims=True) for t in range(3))
        z = jnp.zeros_like(w0)
        return (
            jnp.concatenate([z, w1], axis=axis),  # phase 0
            jnp.concatenate([w0, w2], axis=axis),  # phase 1
        )

    out = []
    for wa in collapse(kernel, 0):
        for wab in collapse(wa, 1):
            out.extend(collapse(wab, 2))
    return out


def phase_conv_transpose(x, kernel):
    """ConvTranspose(kernel 3, stride 2, padding (1,1)) as 8 phase convs +
    one depth-to-space: (N, d, h, w, Ci) -> (N, 2d-1, 2h-1, 2w-1, Co),
    exactly `lax.conv_transpose`'s output (size AND values), with no
    input-dilated conv anywhere in the forward or backward graph."""
    from pytorch3dunet_tpu.ops.conv import _as2d

    F = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    blocks = _as2d(xp, _phase_embed(collapse_deconv_kernels(kernel)), (3, 3, 3, 0, 0, 0))
    full = depth_to_space_blocks(blocks, F)
    # the transposed conv's output is 2n-1 per axis: the trailing phase-1
    # element of each axis (reading only zero padding) is dropped
    return full[:, :-1, :-1, :-1, :]


def concat_group_stats(skip, xs, num_groups, eps=1e-5, factor=8.0):
    """GroupNorm statistics of concat([skip, upsample(xs)], -1) computed
    per-branch in fp32. Returns per-channel (scale-free) (mean_c_group,
    inv_std_c_group) broadcast back to each channel: shapes (N, C).

    Exact: each xs voxel appears `factor` times in the upsampled tensor
    (8 for a 2x nearest upsample in all three dims, 4 for the rank-2 case,
    2 when only the depth axis is phase-folded), so its per-channel sums
    scale by `factor`. Rank-agnostic: skip is (N, *spatial, Cs).
    """
    N, Cs = skip.shape[0], skip.shape[-1]
    Cu = xs.shape[-1]
    C = Cs + Cu
    assert C % num_groups == 0
    gs = C // num_groups
    V = 1
    for s in skip.shape[1:-1]:
        V *= s
    red = tuple(range(1, skip.ndim - 1))

    s32 = skip.astype(jnp.float32)
    x32 = xs.astype(jnp.float32)
    sum_s = s32.sum(axis=red)
    sumsq_s = (s32 * s32).sum(axis=red)
    sum_u = factor * x32.sum(axis=red)
    sumsq_u = factor * (x32 * x32).sum(axis=red)

    sums = jnp.concatenate([sum_s, sum_u], axis=-1).reshape(N, num_groups, gs).sum(-1)
    sumsqs = jnp.concatenate([sumsq_s, sumsq_u], axis=-1).reshape(N, num_groups, gs).sum(-1)
    mean_g = sums / (V * gs)
    # clamp: E[x^2]-E[x]^2 can cancel below 0 in fp32 for large-mean groups
    var_g = jnp.maximum(sumsqs / (V * gs) - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    return mean_c, inv_c


def concat_batch_stats(skip, xs):
    """BatchNorm statistics (per-channel over batch+spatial, flax's
    fast-variance form: var = max(0, E[x^2] - E[x]^2) in fp32) of
    concat([skip, nearest_up(xs)], -1), computed per-branch.

    Exact for ANY nearest upsample factor: replication leaves per-channel
    MEANS unchanged (mean(up(x)) == mean(x), ditto E[x^2]), and BatchNorm
    channels never mix. Rank-agnostic. Returns (mean, var), shapes (C,).
    """
    s32 = skip.astype(jnp.float32)
    x32 = xs.astype(jnp.float32)
    ax_s = tuple(range(s32.ndim - 1))
    ax_x = tuple(range(x32.ndim - 1))
    mean = jnp.concatenate([s32.mean(ax_s), x32.mean(ax_x)])
    mean2 = jnp.concatenate([(s32 * s32).mean(ax_s), (x32 * x32).mean(ax_x)])
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return mean, var


def _apply_norm_affine(skip, xs, affine, dtype):
    """Per-channel affine fold (a_c, b_c) applied to both branches BEFORE the
    channel-split conv: y = x * a_c + b_c. a_c/b_c have shape (C,) (BatchNorm)
    or (N, C) (per-sample GroupNorm); applied in fp32 (see fused_up_concat_conv
    for the opt-in compute-dtype variant's rationale)."""
    Cs = skip.shape[-1]
    a_c, b_c = affine
    a_c = jnp.asarray(a_c, jnp.float32)
    b_c = jnp.asarray(b_c, jnp.float32)
    if a_c.ndim == 1:
        a_c, b_c = a_c[None, :], b_c[None, :]
    bshape = (a_c.shape[0],) + (1,) * (skip.ndim - 2) + (-1,)
    if dtype is not None and dtype != jnp.float32 and os.environ.get("P3DUNET_GN_APPLY", "f32") == "compute":
        a_c, b_c = a_c.astype(dtype), b_c.astype(dtype)
        skip = skip.astype(dtype) * a_c[:, :Cs].reshape(bshape) + b_c[:, :Cs].reshape(bshape)
        xs = xs.astype(dtype) * a_c[:, Cs:].reshape(bshape) + b_c[:, Cs:].reshape(bshape)
    else:
        skip = skip.astype(jnp.float32) * a_c[:, :Cs].reshape(bshape) + b_c[:, :Cs].reshape(bshape)
        xs = xs.astype(jnp.float32) * a_c[:, Cs:].reshape(bshape) + b_c[:, Cs:].reshape(bshape)
    return skip, xs


# ---------------------------------------------------------------------------
# Rank-2 (UNet2D) fused decoder machinery: the same phase-collapse identity
# with 4 phases (a, b) in {0,1}^2. Motivation (v5e trace, BENCH_NOTES r5
# UNet2D decomposition): the unfused 2D decoder joins cost ~11% of the train
# step — nearest-up broadcasts 5.8 ms + concat-backward split 1.6 ms.
# ---------------------------------------------------------------------------


def collapse_phase_kernels_2d(kernel):
    """(3,3,Ci,Co) -> list of 4 phase kernels (2,2,Ci,Co), phase order (a,b)
    with b fastest; phase (a,b) computes output pixels at (2i+a, 2j+b) of
    conv3x3(upsample2x(x), pad=1) — the rank-2 `collapse_phase_kernels`."""

    def collapse(w, axis):
        w0, w1, w2 = (jax.lax.index_in_dim(w, t, axis, keepdims=True) for t in range(3))
        return (
            jnp.concatenate([w0, w1 + w2], axis=axis),
            jnp.concatenate([w0 + w1, w2], axis=axis),
        )

    out = []
    for wa in collapse(kernel, 0):
        out.extend(collapse(wa, 1))
    return out


def embed_wide_kernel_2d(kernel):
    """(3,3,Ci,Co) -> (3,3,Ci,4*Co): per-phase collapsed 2x2 kernels
    zero-embedded at offsets [a:a+2, b:b+2]; one VALID 3x3 conv over the
    padded half-res plane produces every upsample phase at once."""
    ks = collapse_phase_kernels_2d(kernel)
    blocks = []
    for i, (a, b) in enumerate((a, b) for a in (0, 1) for b in (0, 1)):
        blocks.append(jnp.pad(ks[i], ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0))))
    return jnp.concatenate(blocks, axis=-1)


def space_interleave_2d(out, F):
    """(N, h, w, 4F) channel-blocked phases (a,b | b fastest) ->
    (N, 2h, 2w, F) interleaved full-res."""
    N, h, w, _ = out.shape
    out = out.reshape(N, h, w, 2, 2, F)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(N, 2 * h, 2 * w, F)


def phase_conv_upsampled_2d(xs, kernel):
    """conv3x3(nearest_upsample_2x(xs), padding=1) without materializing the
    upsampled tensor: (N, h, w, Ci) x (3, 3, Ci, Co) -> (N, 2h, 2w, Co)."""
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return space_interleave_2d(_conv2d_valid(xp, embed_wide_kernel_2d(kernel)), kernel.shape[-1])


def fused_up_concat_conv_2d(
    skip,
    xs,
    kernel,
    *,
    num_groups=None,
    gn_scale=None,
    gn_bias=None,
    affine=None,
    conv_bias=None,
    dtype=None,
    eps=1e-5,
):
    """Rank-2 `fused_up_concat_conv`: [optional norm] + conv3x3(pad=1) over
    concat([skip, up2x(xs)], -1) with no upsampled/concat tensor.

    skip: (N, 2h, 2w, Cs); xs: (N, h, w, Cu); kernel: (3, 3, Cs+Cu, Co).
    Norm is either GroupNorm (num_groups/gn_scale/gn_bias — per-branch stats
    with replication factor 4) or a precomputed per-channel `affine` (a_c,
    b_c) of shape (C,) — the BatchNorm fold computed by the caller
    (models/blocks.FusedUpConcatConv1, which owns the running-stat update).
    """
    Cs = skip.shape[-1]
    assert skip.shape[1:3] == tuple(2 * s for s in xs.shape[1:3])
    if num_groups is not None:
        mean_c, inv_c = concat_group_stats(skip, xs, num_groups, eps, factor=4.0)
        a_c = inv_c * gn_scale[None, :]
        affine = (a_c, gn_bias[None, :] - mean_c * a_c)
    if affine is not None:
        skip, xs = _apply_norm_affine(skip, xs, affine, dtype)

    if dtype is not None:
        skip = skip.astype(dtype)
        xs = xs.astype(dtype)
        kernel = kernel.astype(dtype)
    else:
        kernel = kernel.astype(skip.dtype)
        xs = xs.astype(skip.dtype)

    out = jax.lax.conv_general_dilated(
        skip,
        kernel[:, :, :Cs, :],
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + phase_conv_upsampled_2d(xs, kernel[:, :, Cs:, :])
    if conv_bias is not None:
        out = out + conv_bias.astype(out.dtype)
    return out


def fused_up_concat_conv(
    skip,
    xs,
    kernel,
    *,
    num_groups=None,
    gn_scale=None,
    gn_bias=None,
    affine=None,
    conv_bias=None,
    dtype=None,
    eps=1e-5,
):
    """[optional GroupNorm] + conv3x3(pad=1) over concat([skip, up2x(xs)], -1),
    fused: no upsampled tensor, no concat, per-branch GN.

    skip: (N, 2d, 2h, 2w, Cs) with xs: (N, d, h, w, Cu)   [full mode], or
    skip: (N, 2d, H, W, Cs) with xs: (N, d, H, W, Cu)      [depth-only mode:
    xs already nearest-resized in H/W, only the depth axis phase-folds].
    kernel: (3, 3, 3, Cs+Cu, Co) — the SAME parameter a plain concat conv uses.
    When num_groups is given, gn_scale/gn_bias are the (Cs+Cu,) GroupNorm
    affine params applied BEFORE the conv (layer_order 'gc...'); `affine`
    is instead a precomputed per-channel (a_c, b_c) fold of shape (C,) — the
    BatchNorm case ('bc...', stats owned by the caller). The fp32 apply is
    the default; P3DUNET_GN_APPLY=compute normalizes in the compute dtype
    from the ORIGINAL tensors (an fp32 apply shares the .astype(f32) with
    the stats sums and XLA materializes a full-volume fp32 copy — measured
    neutral e2e on v5e, latency-hidden, so lower-rounding f32 stays default).
    Returns conv output at skip's resolution.
    """
    Cs = skip.shape[-1]
    depth_only = skip.shape[2] == xs.shape[2]
    assert skip.shape[1] == 2 * xs.shape[1]
    factor = 2.0 if depth_only else 8.0

    if num_groups is not None:
        mean_c, inv_c = concat_group_stats(skip, xs, num_groups, eps, factor=factor)
        a_c = inv_c * gn_scale[None, :]
        affine = (a_c, gn_bias[None, :] - mean_c * a_c)
    if affine is not None:
        skip, xs = _apply_norm_affine(skip, xs, affine, dtype)

    if dtype is not None:
        skip = skip.astype(dtype)
        xs = xs.astype(dtype)
        kernel = kernel.astype(dtype)
    else:
        kernel = kernel.astype(skip.dtype)
        xs = xs.astype(skip.dtype)

    from pytorch3dunet_tpu.ops.conv import _as2d

    F = kernel.shape[-1]
    if depth_only:
        out = _as2d(skip, kernel[:, :, :, :Cs, :], (3, 3, 3, 1, 1, 1))
        out = out + depth_to_space_blocks_d(_upconv_wide_blocks_d(xs, kernel[:, :, :, Cs:, :]), F)
    elif _upconv_mode() == "wide" and os.environ.get("P3DUNET_SKIPCONV", "fullres") == "strided":
        # both branches in channel-blocked phase layout; ONE depth-to-space
        blocks = strided_conv_blocks(skip, kernel[:, :, :, :Cs, :])
        blocks = blocks + _upconv_wide_blocks(xs, kernel[:, :, :, Cs:, :])
        out = depth_to_space_blocks(blocks, F)
    else:
        out = _as2d(skip, kernel[:, :, :, :Cs, :], (3, 3, 3, 1, 1, 1))
        out = out + phase_conv_upsampled(xs, kernel[:, :, :, Cs:, :])
    if conv_bias is not None:
        out = out + conv_bias.astype(out.dtype)
    return out
