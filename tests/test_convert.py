"""convert3dunet CLI: bidirectional checkpoint conversion round-trips."""

import os

import jax
import numpy as np
import pytest
import yaml

from pytorch3dunet_tpu.convert import convert_checkpoint, main
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.utils.checkpoint import _is_torch_checkpoint, load_checkpoint, state_to_bytes


CONFIG = {"model": {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                    "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}}


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_native_to_torch_and_back_roundtrip(tmpdir):
    model = get_model(dict(CONFIG["model"]))
    variables = model.init(jax.random.PRNGKey(7))
    native = os.path.join(str(tmpdir), "native.ckpt")
    with open(native, "wb") as f:
        f.write(state_to_bytes({"model_state_dict": variables, "num_epochs": 3,
                                "num_iterations": 42, "best_eval_score": 0.5}))

    torch_path = os.path.join(str(tmpdir), "exported.pytorch")
    assert convert_checkpoint(CONFIG, native, torch_path) == "torch"
    assert _is_torch_checkpoint(torch_path)

    back = os.path.join(str(tmpdir), "back.ckpt")
    assert convert_checkpoint(CONFIG, torch_path, back) == "native"
    assert not _is_torch_checkpoint(back)

    restored = load_checkpoint(back, variables_template=variables)["model_state_dict"]
    for a, b in zip(_leaves(variables), _leaves(restored)):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_cli_main(tmpdir):
    model = get_model(dict(CONFIG["model"]))
    variables = model.init(jax.random.PRNGKey(0))
    native = os.path.join(str(tmpdir), "native.ckpt")
    with open(native, "wb") as f:
        f.write(state_to_bytes({"model_state_dict": variables, "num_epochs": 0,
                                "num_iterations": 1, "best_eval_score": None}))
    cfg_path = os.path.join(str(tmpdir), "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG, f)

    out = os.path.join(str(tmpdir), "out.pytorch")
    main(["--config", cfg_path, "-i", native, "-o", out, "--to", "torch"])
    assert os.path.exists(out) and _is_torch_checkpoint(out)


@pytest.mark.parametrize("model_name", ["UNet3D", "ResidualUNetSE3D"])
def test_exported_checkpoint_runs_in_the_reference(tmpdir, model_name):
    """Reverse-direction proof: a model trained HERE, exported with
    convert3dunet, loads into the live torch reference with strict=True and
    reproduces our probabilities — reference users can consume our models."""
    from tests.test_torch_parity import _import_reference

    if not _import_reference():
        pytest.skip("reference package not importable")
    import torch
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    model_cfg = dict(CONFIG["model"], name=model_name)
    model = get_model(dict(model_cfg))
    variables = model.init(jax.random.PRNGKey(3))
    native = os.path.join(str(tmpdir), "native.ckpt")
    with open(native, "wb") as f:
        f.write(state_to_bytes({"model_state_dict": variables, "num_epochs": 0,
                                "num_iterations": 1, "best_eval_score": None}))
    exported = os.path.join(str(tmpdir), "exported.pytorch")
    convert_checkpoint({"model": model_cfg}, native, exported, to="torch")

    tmodel = torch_get_model(dict(model_cfg))
    state = torch.load(exported, map_location="cpu", weights_only=True)
    missing = tmodel.load_state_dict(state["model_state_dict"], strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    x = np.random.RandomState(5).rand(1, 1, 8, 16, 16).astype(np.float32)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()  # eval mode applies softmax
    probs, _ = model.module.apply(variables, np.moveaxis(x, 1, -1), train=False)
    got = np.moveaxis(np.asarray(probs), -1, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_wrong_architecture_fails_loudly(tmpdir):
    model = get_model(dict(CONFIG["model"]))
    variables = model.init(jax.random.PRNGKey(0))
    native = os.path.join(str(tmpdir), "native.ckpt")
    with open(native, "wb") as f:
        f.write(state_to_bytes({"model_state_dict": variables, "num_epochs": 0,
                                "num_iterations": 1, "best_eval_score": None}))

    bad = {"model": dict(CONFIG["model"], f_maps=16)}
    try:
        convert_checkpoint(bad, native, os.path.join(str(tmpdir), "x.pytorch"))
        raise AssertionError("expected a shape-mismatch failure")
    except ValueError as e:
        assert "shape" in str(e)
