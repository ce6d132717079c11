"""Numerics parity tests against torch ops (torch runs on CPU as the oracle).

Validates the weight-layout conversions in utils/torch_interop.py and — via a
stubbed import of the reference package — full-model forward parity, which is
the foundation for loading published pretrained reference checkpoints.
"""

import sys
import types

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import flax.linen as nn

from pytorch3dunet_tpu.models.blocks import SingleConv
from pytorch3dunet_tpu.ops.interp import resize_spatial
from pytorch3dunet_tpu.utils.torch_interop import (
    _convert_conv_transpose_weight,
    _convert_conv_weight,
    torch_state_dict_to_params,
)


def _np(x):
    return x.detach().numpy()


class TestOpParity:
    def test_conv3d(self):
        tconv = tnn.Conv3d(4, 8, 3, padding=1)
        x = torch.randn(2, 4, 6, 10, 10)
        want = _np(tconv(x))  # NCDHW

        kernel = _convert_conv_weight(_np(tconv.weight))
        x_cl = np.moveaxis(_np(x), 1, -1)
        conv = nn.Conv(8, kernel_size=(3, 3, 3), padding=[(1, 1)] * 3)
        got = conv.apply({"params": {"kernel": kernel, "bias": _np(tconv.bias)}}, x_cl)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-5)

    def test_group_norm(self):
        tgn = tnn.GroupNorm(4, 8)
        with torch.no_grad():
            tgn.weight.normal_()
            tgn.bias.normal_()
        x = torch.randn(2, 8, 4, 6, 6)
        want = _np(tgn(x))

        x_cl = np.moveaxis(_np(x), 1, -1)
        gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
        got = gn.apply({"params": {"scale": _np(tgn.weight), "bias": _np(tgn.bias)}}, x_cl)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-5)

    def test_conv_transpose3d(self):
        tdeconv = tnn.ConvTranspose3d(6, 4, kernel_size=3, stride=2, padding=1, bias=False)
        x = torch.randn(1, 6, 5, 7, 7)
        want = _np(tdeconv(x))  # (1, 4, 9, 13, 13)

        kernel = _convert_conv_transpose_weight(_np(tdeconv.weight))
        x_cl = np.moveaxis(_np(x), 1, -1)
        deconv = nn.ConvTranspose(4, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                                  padding=[(1, 1)] * 3, use_bias=False)
        got = deconv.apply({"params": {"kernel": kernel}}, x_cl)
        got = np.moveaxis(np.asarray(got), -1, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_max_pool_odd_sizes(self):
        # torch floor-division output sizes must match flax VALID pooling
        x = torch.randn(1, 3, 7, 9, 11)
        want = _np(F.max_pool3d(x, 2))
        x_cl = np.moveaxis(_np(x), 1, -1)
        got = nn.max_pool(x_cl, window_shape=(2, 2, 2), strides=(2, 2, 2), padding="VALID")
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-6)

    @pytest.mark.parametrize("size", [(8, 10, 10), (9, 13, 13), (5, 17, 6)])
    def test_nearest_upsample(self, size):
        x = torch.randn(1, 3, 4, 5, 5)
        want = _np(F.interpolate(x, size=size, mode="nearest"))
        x_cl = np.moveaxis(_np(x), 1, -1)
        got = resize_spatial(np.asarray(x_cl), size, mode="nearest")
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-6)

    def test_single_conv_gcr_chain(self):
        """Full layer-order chain: torch GN->Conv->ReLU vs our SingleConv."""
        tgn = tnn.GroupNorm(2, 4)
        tconv = tnn.Conv3d(4, 8, 3, padding=1, bias=False)
        with torch.no_grad():
            tgn.weight.normal_()
            tgn.bias.normal_()
        x = torch.randn(1, 4, 6, 8, 8)
        want = _np(F.relu(tconv(tgn(x))))

        params = {
            "groupnorm": {"scale": _np(tgn.weight), "bias": _np(tgn.bias)},
            "conv": {"kernel": _convert_conv_weight(_np(tconv.weight))},
        }
        sc = SingleConv(out_channels=8, order="gcr", num_groups=2, spatial_rank=3)
        x_cl = np.moveaxis(_np(x), 1, -1)
        got = sc.apply({"params": params}, x_cl)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-5)


def _import_reference():
    """Imports the reference package with scikit-image stubbed out (it is not
    installed here and is irrelevant for the model-forward oracle)."""
    if "pytorch3dunet" in sys.modules:
        return True
    stubs = {
        "skimage": {},
        "skimage.color": {"label2rgb": lambda *a, **k: None},
        "skimage.exposure": {"rescale_intensity": None, "adjust_gamma": None},
        "skimage.filters": {"gaussian": None},
        "skimage.measure": {"label": None},
        "skimage.metrics": {"adapted_rand_error": None, "mean_squared_error": None,
                            "peak_signal_noise_ratio": None, "contingency_table": None},
        "skimage.segmentation": {"find_boundaries": None},
        "skimage.morphology": {},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for attr, val in attrs.items():
                setattr(mod, attr, val)
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference")
    try:
        import pytorch3dunet.unet3d.model  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.parametrize("model_name", ["UNet3D", "ResidualUNet3D", "ResidualUNetSE3D"])
def test_full_model_forward_parity(model_name):
    """Reference torch model vs our model with ported weights: same forward.

    This is the Dice-parity foundation: if logits agree to ~1e-4, every
    downstream loss/metric agrees far below the 1e-3 target.
    """
    if not _import_reference():
        pytest.skip("reference package not importable")
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    from pytorch3dunet_tpu.models import get_model

    cfg = {"name": model_name, "in_channels": 1, "out_channels": 2, "f_maps": 8,
           "num_groups": 4, "num_levels": 3, "final_sigmoid": True}
    torch.manual_seed(0)
    tmodel = torch_get_model(dict(cfg))
    tmodel.eval()

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_dict_to_params(state)

    model = get_model(dict(cfg))
    x = np.random.RandomState(5).rand(1, 16, 32, 32, 1).astype(np.float32)

    with torch.no_grad():
        want_probs, want_logits = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)), return_logits=True)
    probs, logits = model.apply({"params": params}, x)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(logits), -1, 1), _np(want_logits), atol=2e-4,
        err_msg=f"{model_name} logits diverge from the torch reference",
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(probs), -1, 1), _np(want_probs), atol=2e-4,
    )


@pytest.mark.parametrize("model_name", ["UNet3D", "ResidualUNet3D"])
def test_export_roundtrip(model_name):
    """Our params -> torch state dict -> back: identical tree (bidirectional interop)."""
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.utils.torch_interop import params_to_torch_state_dict

    cfg = {"name": model_name, "in_channels": 2, "out_channels": 3, "f_maps": 8,
           "num_groups": 4, "num_levels": 3}
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(1), patch_shape=(8, 16, 16))

    state = params_to_torch_state_dict(variables["params"])
    restored = torch_state_dict_to_params(state)

    flat_orig = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_back = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    flat_back = {tuple(str(getattr(p, "key", p)) for p in k): v for k, v in flat_back.items()}
    for path, leaf in flat_orig:
        key = tuple(str(getattr(p, "key", p)) for p in path)
        assert key in flat_back, f"missing {key} after round trip"
        np.testing.assert_allclose(np.asarray(leaf), flat_back[key], atol=1e-6, err_msg=str(key))


def test_export_loads_into_reference():
    """Exported checkpoints load into the reference torch model and match outputs."""
    if not _import_reference():
        pytest.skip("reference package not importable")
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.utils.torch_interop import params_to_torch_state_dict

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "f_maps": 8,
           "num_groups": 4, "num_levels": 2, "final_sigmoid": True}
    model = get_model(dict(cfg))
    variables = model.init(jax.random.PRNGKey(3), patch_shape=(8, 16, 16))

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in params_to_torch_state_dict(variables["params"]).items()}
    tmodel = torch_get_model(dict(cfg))
    tmodel.load_state_dict(state)
    tmodel.eval()

    x = np.random.RandomState(8).rand(1, 8, 16, 16, 1).astype(np.float32)
    probs, _ = model.apply(variables, x)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(probs), -1, 1), _np(want), atol=2e-4)


def test_batchnorm_running_stats_roundtrip_parity():
    """'bcr'-order checkpoints: running_mean/var must survive the torch->flax
    import (inference uses them; init stats would silently be wrong) and the
    flax->torch export."""
    if not _import_reference():
        pytest.skip("reference package not importable")
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.utils.torch_interop import (
        batch_stats_to_torch_entries,
        torch_state_dict_to_batch_stats,
    )

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
           "num_groups": 4, "num_levels": 2, "layer_order": "bcr", "final_sigmoid": True}
    torch.manual_seed(0)
    tmodel = torch_get_model(dict(cfg))
    # drive the running stats away from the init values
    tmodel.train()
    with torch.no_grad():
        for seed in range(3):
            tmodel(torch.from_numpy(
                np.random.RandomState(seed).rand(1, 1, 8, 16, 16).astype(np.float32) * 3 + 1))
    tmodel.eval()

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_dict_to_params(state)
    batch_stats = torch_state_dict_to_batch_stats(state)
    assert batch_stats, "no running stats imported"

    model = get_model(dict(cfg))
    x = np.random.RandomState(7).rand(1, 8, 16, 16, 1).astype(np.float32)
    with torch.no_grad():
        _, want_logits = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)), return_logits=True)
    _, logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(logits), -1, 1), _np(want_logits), atol=2e-4)

    # export round-trip: every torch running-stat key is reproduced exactly
    exported = batch_stats_to_torch_entries(batch_stats)
    for key, value in state.items():
        if key.endswith(("running_mean", "running_var")):
            np.testing.assert_array_equal(exported[key], value)
