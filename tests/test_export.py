"""jax.export serving artifacts (pytorch3dunet_tpu/export.py).

The reference has no export story — deployment re-runs predict.py against a
checkpoint (reference predict.py:41-66). The exporter packages the forward
(weights baked in, StableHLO body) so a bare JAX runtime can serve it; these
tests assert the artifact reproduces the live model exactly, survives the
zip round trip, and that the CLI surface works end-to-end.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from pytorch3dunet_tpu.export import export_model, load_exported, main
from pytorch3dunet_tpu.models import get_model

MODEL_2D = {"name": "UNet2D", "in_channels": 1, "out_channels": 2, "f_maps": 4,
            "layer_order": "gcr", "num_groups": 2, "final_sigmoid": True}
MODEL_3D = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 4,
            "layer_order": "gcr", "num_groups": 2, "final_sigmoid": True}


def _live_probs(model_cfg, x, normalize=None):
    model = get_model(model_cfg)
    variables = jax.jit(lambda k: model.init(k))(jax.random.PRNGKey(0))
    x = jnp.asarray(x)
    if normalize == "standardize_patch":
        x = jax.vmap(lambda p: (p - jnp.mean(p)) / jnp.clip(jnp.std(p), 1e-10))(x)
    probs, _ = model.module.apply(variables, x, train=False)
    return np.asarray(probs)


def test_export_2d_poly_batch_matches_live(tmp_path):
    path = str(tmp_path / "m2d.u3dx")
    meta = export_model({"model": MODEL_2D}, None, path, patch_shape=(16, 16),
                        batch="poly", platforms=("cpu",))
    assert meta["batch"] == "poly"
    m = load_exported(path)
    assert m.meta["patch_shape"] == [16, 16]

    rs = np.random.RandomState(0)
    for b in (1, 3):  # the symbolic batch dim serves any batch size
        x = rs.rand(b, 16, 16, 1).astype(np.float32)
        np.testing.assert_allclose(m(x), _live_probs(MODEL_2D, x), atol=1e-5)


def test_export_3d_fixed_batch_and_normalization(tmp_path):
    path = str(tmp_path / "m3d.u3dx")
    export_model({"model": MODEL_3D}, None, path, patch_shape=(8, 8, 8),
                 batch=2, platforms=("cpu",), normalize="standardize_patch")
    m = load_exported(path)
    x = np.random.RandomState(1).rand(2, 8, 8, 8, 1).astype(np.float32)
    got = m(x)
    assert got.shape == (2, 8, 8, 8, 1)
    np.testing.assert_allclose(
        got, _live_probs(MODEL_3D, x, normalize="standardize_patch"), atol=1e-5)


def test_unbatched_call_convenience(tmp_path):
    path = str(tmp_path / "m.u3dx")
    export_model({"model": MODEL_2D}, None, path, patch_shape=(16, 16),
                 batch="poly", platforms=("cpu",))
    m = load_exported(path)
    x = np.random.RandomState(2).rand(16, 16, 1).astype(np.float32)
    single = m(x)  # a bare patch: batched internally, squeezed back
    assert single.shape == (16, 16, 2)
    np.testing.assert_allclose(single, m(x[None])[0], atol=0)


def test_pool_divisibility_rejected(tmp_path):
    with pytest.raises(AssertionError, match="divisible"):
        export_model({"model": MODEL_2D}, None, str(tmp_path / "m.u3dx"),
                     patch_shape=(12, 16), platforms=("cpu",))


def test_export_bakes_checkpoint_weights(tmp_path):
    """The artifact must carry the TRAINED weights, not the fresh init."""
    from pytorch3dunet_tpu.utils.checkpoint import state_to_bytes

    model = get_model(MODEL_2D)
    variables = jax.jit(lambda k: model.init(k))(jax.random.PRNGKey(7))
    # perturb so trained-vs-fresh is distinguishable
    variables = jax.tree_util.tree_map(lambda p: p + 0.1, variables)
    ckpt = tmp_path / "trained.ckpt"
    ckpt.write_bytes(state_to_bytes(
        {"model_state_dict": variables, "num_epochs": 1, "num_iterations": 1,
         "best_eval_score": None}))

    path = str(tmp_path / "m.u3dx")
    export_model({"model": MODEL_2D}, str(ckpt), path, patch_shape=(16, 16),
                 batch=1, platforms=("cpu",))
    m = load_exported(path)
    x = np.random.RandomState(3).rand(1, 16, 16, 1).astype(np.float32)
    probs, _ = model.module.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(m(x), np.asarray(probs), atol=1e-5)
    assert np.abs(m(x) - _live_probs(MODEL_2D, x)).max() > 1e-4


def test_cli_end_to_end(tmp_path):
    cfg = tmp_path / "config.yml"
    cfg.write_text(yaml.safe_dump({"model": MODEL_2D}))
    out = str(tmp_path / "cli.u3dx")
    main(["--config", str(cfg), "--output", out, "--patch-shape", "16", "16",
          "--platforms", "cpu", "--normalize", "standardize_patch"])

    with zipfile.ZipFile(out) as z:
        meta = json.loads(z.read("meta.json"))
    assert meta["model"]["name"] == "UNet2D"
    assert meta["normalize"] == "standardize_patch"
    assert meta["platforms"] == ["cpu"]
    assert meta["format"].startswith("pytorch3dunet_tpu.export/")

    m = load_exported(out)
    x = np.random.RandomState(4).rand(2, 16, 16, 1).astype(np.float32)
    np.testing.assert_allclose(
        m(x), _live_probs(MODEL_2D, x, normalize="standardize_patch"), atol=1e-5)
