"""Fused decoder joining (ops/upconv.py + blocks.FusedDecoderDoubleConv):
exact equivalence with the naive upsample + concat + GroupNorm + conv path.

Reference semantics: buildingblocks.py:387-493 (Decoder with
InterpolateUpsampling(nearest) + concat joining + DoubleConv 'gcr')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3dunet_tpu.models.blocks import Decoder
from pytorch3dunet_tpu.ops.conv import _as2d
from pytorch3dunet_tpu.ops.upconv import fused_up_concat_conv, phase_conv_upsampled


def _upsample2(x):
    n, d, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :], (n, d, 2, h, 2, w, 2, c)
    ).reshape(n, 2 * d, 2 * h, 2 * w, c)


def test_phase_conv_matches_upsample_conv():
    k = jax.random.PRNGKey(0)
    xs = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, 5, 4, 6))
    W = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, 3, 6, 7))
    ref = _as2d(_upsample2(xs), W, (3, 3, 3, 1, 1, 1))
    got = phase_conv_upsampled(xs, W)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_up_concat_conv_with_groupnorm():
    import flax.linen as nn

    k = jax.random.PRNGKey(3)
    xs = jax.random.normal(jax.random.fold_in(k, 1), (1, 3, 4, 5, 6))
    skip = jax.random.normal(jax.random.fold_in(k, 2), (1, 6, 8, 10, 2))
    W = jax.random.normal(jax.random.fold_in(k, 3), (3, 3, 3, 8, 5))
    scale = jax.random.normal(jax.random.fold_in(k, 4), (8,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 5), (8,)) * 0.1

    cat = jnp.concatenate([skip, _upsample2(xs)], -1)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32)
    ref = _as2d(gn.apply({"params": {"scale": scale, "bias": bias}}, cat), W, (3, 3, 3, 1, 1, 1))
    got = fused_up_concat_conv(skip, xs, W, num_groups=4, gn_scale=scale, gn_bias=bias)
    np.testing.assert_allclose(got, ref, atol=2e-4)

    # gradients agree through both formulations
    def loss_ref(W_, s_, x_):
        c = jnp.concatenate([s_, _upsample2(x_)], -1)
        o = _as2d(gn.apply({"params": {"scale": scale, "bias": bias}}, c), W_, (3, 3, 3, 1, 1, 1))
        return (o**2).sum()

    def loss_got(W_, s_, x_):
        return (fused_up_concat_conv(s_, x_, W_, num_groups=4, gn_scale=scale, gn_bias=bias) ** 2).sum()

    g_ref = jax.grad(loss_ref, (0, 1, 2))(W, skip, xs)
    g_got = jax.grad(loss_got, (0, 1, 2))(W, skip, xs)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(b, a, atol=2e-3 * max(1.0, float(jnp.abs(a).max())))


def test_upconv_variants_identical():
    """'wide' (zero-embedded single conv) and 'strided' skip blocks compute
    the same function as the 8-phase formulation / plain conv."""
    from pytorch3dunet_tpu.ops.upconv import (
        _phase_conv_upsampled_wide,
        depth_to_space_blocks,
        strided_conv_blocks,
    )

    k = jax.random.PRNGKey(7)
    xs = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, 5, 4, 6))
    W = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, 3, 6, 7))
    np.testing.assert_allclose(
        _phase_conv_upsampled_wide(xs, W), phase_conv_upsampled(xs, W), atol=1e-5
    )
    x = jax.random.normal(jax.random.fold_in(k, 3), (2, 6, 8, 10, 5))
    W2 = jax.random.normal(jax.random.fold_in(k, 4), (3, 3, 3, 5, 7))
    np.testing.assert_allclose(
        depth_to_space_blocks(strided_conv_blocks(x, W2), 7),
        _as2d(x, W2, (3, 3, 3, 1, 1, 1)),
        atol=1e-5,
    )


@pytest.mark.parametrize("upconv,skipconv", [("phase", "fullres"), ("wide", "fullres"), ("wide", "strided")])
def test_decoder_variants_match_generic(upconv, skipconv, monkeypatch):
    monkeypatch.setenv("P3DUNET_UPCONV", upconv)
    monkeypatch.setenv("P3DUNET_SKIPCONV", skipconv)
    dec = Decoder(out_channels=8, conv_layer_order="gcr", num_groups=4, spatial_rank=3)
    k = jax.random.PRNGKey(13)
    skip = jax.random.normal(jax.random.fold_in(k, 1), (1, 8, 6, 10, 4))
    x = jax.random.normal(jax.random.fold_in(k, 2), (1, 4, 3, 5, 8))
    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "1")
    v = dec.init(jax.random.PRNGKey(0), skip, x)
    o1 = dec.apply(v, skip, x)
    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "0")
    o0 = dec.apply(v, skip, x)
    np.testing.assert_allclose(o1, o0, atol=2e-4)


@pytest.mark.parametrize("order", ["gcr", "cr", "crg"])
def test_decoder_fused_matches_generic(order):
    dec_kwargs = dict(
        out_channels=8,
        basic_module="DoubleConv",
        conv_layer_order=order,
        num_groups=4,
        upsample_mode="nearest",
        concat=True,
        spatial_rank=3,
    )
    k = jax.random.PRNGKey(11)
    skip = jax.random.normal(jax.random.fold_in(k, 1), (1, 8, 6, 10, 4))
    x = jax.random.normal(jax.random.fold_in(k, 2), (1, 4, 3, 5, 8))

    dec = Decoder(**dec_kwargs)
    prev = os.environ.get("P3DUNET_FUSED_DECODER")
    try:
        os.environ["P3DUNET_FUSED_DECODER"] = "1"
        v1 = dec.init(jax.random.PRNGKey(0), skip, x)
        o1 = dec.apply(v1, skip, x)
        os.environ["P3DUNET_FUSED_DECODER"] = "0"
        v0 = dec.init(jax.random.PRNGKey(0), skip, x)
        o0 = dec.apply(v0, skip, x)
    finally:
        if prev is None:
            os.environ.pop("P3DUNET_FUSED_DECODER", None)
        else:
            os.environ["P3DUNET_FUSED_DECODER"] = prev

    # identical parameter trees and initial values -> checkpoint compatible
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(o1, o0, atol=2e-4)


def test_decoder_mixed_exactness_matches_generic():
    """Exact-2x depth with irregular H/W (the 85 <- 42 pooling-floor case)
    takes the depth-only fused path; output equals the generic path."""
    dec = Decoder(out_channels=8, conv_layer_order="gcr", num_groups=4, spatial_rank=3)
    k = jax.random.PRNGKey(5)
    skip = jax.random.normal(jax.random.fold_in(k, 1), (1, 8, 7, 11, 4))  # H,W odd
    x = jax.random.normal(jax.random.fold_in(k, 2), (1, 4, 3, 5, 8))
    os.environ["P3DUNET_FUSED_DECODER"] = "1"
    os.environ["P3DUNET_FUSED_DECODER_MIXED"] = "1"
    try:
        v = dec.init(jax.random.PRNGKey(0), skip, x)
        o1 = dec.apply(v, skip, x)
        os.environ["P3DUNET_FUSED_DECODER"] = "0"
        o0 = dec.apply(v, skip, x)
    finally:
        os.environ.pop("P3DUNET_FUSED_DECODER", None)
        os.environ.pop("P3DUNET_FUSED_DECODER_MIXED", None)
    assert o1.shape == (1, 8, 7, 11, 8)
    np.testing.assert_allclose(o1, o0, atol=2e-4)


def test_decoder_fused_fallback_on_non_2x_depth():
    """Non-exact 2x DEPTH must take the generic resize path."""
    dec = Decoder(out_channels=8, conv_layer_order="gcr", num_groups=4, spatial_rank=3)
    k = jax.random.PRNGKey(5)
    skip = jax.random.normal(jax.random.fold_in(k, 1), (1, 7, 6, 10, 4))  # 7 != 2*3
    x = jax.random.normal(jax.random.fold_in(k, 2), (1, 3, 3, 5, 8))
    v = dec.init(jax.random.PRNGKey(0), skip, x)
    out = dec.apply(v, skip, x)
    assert out.shape == (1, 7, 6, 10, 8)
    # and the fused param names are still the generic ones
    assert "SingleConv1" in v["params"]["basic_module"]


def _upsample2_2d(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(
        n, 2 * h, 2 * w, c
    )


def _conv2d_same(x, W):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_phase_conv_2d_matches_upsample_conv():
    from pytorch3dunet_tpu.ops.upconv import phase_conv_upsampled_2d

    k = jax.random.PRNGKey(2)
    xs = jax.random.normal(jax.random.fold_in(k, 1), (2, 5, 4, 6))
    W = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, 6, 7))
    ref = _conv2d_same(_upsample2_2d(xs), W)
    got = phase_conv_upsampled_2d(xs, W)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_up_concat_conv_2d_with_groupnorm():
    import flax.linen as nn

    from pytorch3dunet_tpu.ops.upconv import fused_up_concat_conv_2d

    k = jax.random.PRNGKey(4)
    xs = jax.random.normal(jax.random.fold_in(k, 1), (2, 4, 5, 6))
    skip = jax.random.normal(jax.random.fold_in(k, 2), (2, 8, 10, 2))
    W = jax.random.normal(jax.random.fold_in(k, 3), (3, 3, 8, 5))
    scale = jax.random.normal(jax.random.fold_in(k, 4), (8,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 5), (8,)) * 0.1

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32)

    def ref_fn(W_, s_, x_):
        cat = jnp.concatenate([s_, _upsample2_2d(x_)], -1)
        return _conv2d_same(gn.apply({"params": {"scale": scale, "bias": bias}}, cat), W_)

    def got_fn(W_, s_, x_):
        return fused_up_concat_conv_2d(s_, x_, W_, num_groups=4, gn_scale=scale, gn_bias=bias)

    np.testing.assert_allclose(got_fn(W, skip, xs), ref_fn(W, skip, xs), atol=2e-4)
    g_ref = jax.grad(lambda *a: (ref_fn(*a) ** 2).sum(), (0, 1, 2))(W, skip, xs)
    g_got = jax.grad(lambda *a: (got_fn(*a) ** 2).sum(), (0, 1, 2))(W, skip, xs)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(b, a, atol=2e-3 * max(1.0, float(jnp.abs(a).max())))


@pytest.mark.parametrize("rank,order", [(2, "bcr"), (2, "gcr"), (2, "cr"), (3, "bcr"), (3, "cbr")])
def test_decoder_fused_norm_variants_match_generic(rank, order, monkeypatch):
    """Fused decoder == generic decoder for rank-2 joins and BatchNorm-prefix
    orders (the dsb2018 2D 'bcr' shape): eval forward, train forward, the
    running-stat updates, and gradients, on an identical variable tree."""
    dec = Decoder(out_channels=8, conv_layer_order=order, num_groups=4, spatial_rank=rank)
    k = jax.random.PRNGKey(17)
    if rank == 2:
        skip = jax.random.normal(jax.random.fold_in(k, 1), (2, 8, 10, 4))
        x = jax.random.normal(jax.random.fold_in(k, 2), (2, 4, 5, 8))
    else:
        skip = jax.random.normal(jax.random.fold_in(k, 1), (1, 8, 6, 10, 4))
        x = jax.random.normal(jax.random.fold_in(k, 2), (1, 4, 3, 5, 8))

    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "1")
    v1 = dec.init(jax.random.PRNGKey(0), skip, x)
    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "0")
    v0 = dec.init(jax.random.PRNGKey(0), skip, x)

    # identical variable trees (params AND batch_stats) -> checkpoint compatible
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mutable = ["batch_stats"] if "b" in order else []
    for fused in ("1", "0"):
        monkeypatch.setenv("P3DUNET_FUSED_DECODER", fused)
        out_eval = dec.apply(v0, skip, x)
        out_train, new_state = dec.apply(v0, skip, x, train=True, mutable=mutable)
        grads = jax.grad(
            lambda p: (dec.apply({**v0, "params": p}, skip, x, train=True, mutable=mutable)[0] ** 2).sum()
        )(v0["params"])
        if fused == "1":
            ref = (out_eval, out_train, new_state, grads)
        else:
            np.testing.assert_allclose(ref[0], out_eval, atol=2e-4)
            np.testing.assert_allclose(ref[1], out_train, atol=2e-4)
            for a, b in zip(jax.tree_util.tree_leaves(ref[2]), jax.tree_util.tree_leaves(new_state)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
            for a, b in zip(jax.tree_util.tree_leaves(ref[3]), jax.tree_util.tree_leaves(grads)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-3 * max(1.0, float(np.abs(b).max()))
                )


def test_unet2d_bcr_fused_matches_generic(monkeypatch):
    """Whole-model UNet2D 'bcr' (the dsb2018 recipe shape): fused-decoder
    train step == generic, including the mutated batch_stats."""
    from pytorch3dunet_tpu.models import get_model

    cfg = {
        "name": "UNet2D",
        "in_channels": 1,
        "out_channels": 1,
        "f_maps": [8, 16, 32],
        "layer_order": "bcr",
        "final_sigmoid": True,
    }
    model = get_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 1))

    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "1")
    v1 = model.init(jax.random.PRNGKey(0), patch_shape=(32, 32))
    monkeypatch.setenv("P3DUNET_FUSED_DECODER", "0")
    v0 = model.init(jax.random.PRNGKey(0), patch_shape=(32, 32))
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    outs = {}
    for fused in ("1", "0"):
        monkeypatch.setenv("P3DUNET_FUSED_DECODER", fused)
        (probs, logits), state = model.apply(v0, x, train=True, mutable=["batch_stats"])
        grads = jax.grad(
            lambda p: (
                model.apply({**v0, "params": p}, x, train=True, mutable=["batch_stats"])[0][1] ** 2
            ).sum()
        )(v0["params"])
        outs[fused] = (logits, state, grads)
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"][1]), jax.tree_util.tree_leaves(outs["0"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"][2]), jax.tree_util.tree_leaves(outs["0"][2])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * max(1.0, float(np.abs(b).max()))
        )


def test_phase_conv_transpose_matches_lax():
    """phase_conv_transpose == lax.conv_transpose(k=3, s=2, padding (1,1)) —
    values AND output size (2n-1), forward and gradients."""
    from pytorch3dunet_tpu.ops.upconv import phase_conv_transpose

    k = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, 5, 4, 6))
    W = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, 3, 6, 7))

    def ref(x, W):
        return jax.lax.conv_transpose(
            x, W, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    r = ref(x, W)
    g = phase_conv_transpose(x, W)
    assert g.shape == r.shape == (2, 5, 9, 7, 7)
    np.testing.assert_allclose(g, r, atol=1e-4)

    # gradients agree too (both are the same linear map, but the graphs
    # differ completely — regular convs vs input-dilated)
    ct = jax.random.normal(jax.random.fold_in(k, 3), r.shape)
    gx_r, gw_r = jax.grad(lambda x, W: jnp.sum(ref(x, W) * ct), argnums=(0, 1))(x, W)
    gx_g, gw_g = jax.grad(lambda x, W: jnp.sum(phase_conv_transpose(x, W) * ct), argnums=(0, 1))(x, W)
    np.testing.assert_allclose(gx_g, gx_r, atol=1e-3)
    np.testing.assert_allclose(gw_g, gw_r, atol=1e-3)


def test_decoder_deconv_phase_matches_xla(monkeypatch):
    """The Decoder's phase-decomposed deconv path == the nn.ConvTranspose
    path: same params (scope 'upsampling'), same output."""
    from pytorch3dunet_tpu.models.blocks import Decoder

    dec = Decoder(out_channels=8, basic_module="ResNetBlock", conv_layer_order="gcr",
                  num_groups=4, upsample_mode="deconv", concat=False)
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(k, 1), (1, 4, 5, 6, 8))
    enc = jax.random.normal(jax.random.fold_in(k, 2), (1, 8, 10, 12, 8))

    monkeypatch.setenv("P3DUNET_DECONV", "phase")
    variables = dec.init(jax.random.PRNGKey(0), enc, x)
    out_phase = dec.apply(variables, enc, x)

    monkeypatch.setenv("P3DUNET_DECONV", "xla")
    variables_x = dec.init(jax.random.PRNGKey(0), enc, x)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(variables_x)
    out_xla = dec.apply(variables, enc, x)
    np.testing.assert_allclose(out_phase, out_xla, atol=1e-4)
