"""End-to-end prediction tests (reference: tests/test_predictor.py): output
file existence + shape, segmentation saving, performance metric, and
LazyPredictor parity."""

import os

import h5py
import jax
import numpy as np

from pytorch3dunet_tpu.datasets.utils import get_test_loaders
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.predict import get_predictor


def _setup(config, tmpdir, shape=(32, 80, 80), in_channels=1):
    path = os.path.join(tmpdir, "test.h5")
    with h5py.File(path, "w") as f:
        if in_channels == 1:
            f.create_dataset("raw", data=np.random.rand(*shape))
        else:
            f.create_dataset("raw", data=np.random.rand(in_channels, *shape))
        f.create_dataset("label", data=np.random.randint(0, 2, shape))
    config["loaders"]["test"]["file_paths"] = [path]
    config["loaders"]["output_dir"] = str(tmpdir)
    config["model"]["f_maps"] = 8
    config["model"]["num_groups"] = 4
    config["model"]["num_levels"] = 3
    return path, shape


def _run_prediction(config):
    model = get_model(config["model"])
    variables = model.init(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)
    results = []
    for loader in get_test_loaders(config):
        results.append(predictor(loader))
        predictor.finalize()
    return results


class TestStandardPredictor3D:
    def test_output_shape(self, test_config, tmpdir):
        _, shape = _setup(test_config, str(tmpdir))
        # shrink the patch for test speed
        test_config["loaders"]["test"]["slice_builder"]["patch_shape"] = [16, 64, 64]
        test_config["loaders"]["test"]["slice_builder"]["stride_shape"] = [8, 32, 32]
        _run_prediction(test_config)

        out = os.path.join(str(tmpdir), "test_predictions.h5")
        assert os.path.exists(out)
        with h5py.File(out, "r") as f:
            assert f["predictions"].shape == (2, *shape)
            pred = f["predictions"][:]
        assert pred.min() >= 0 and pred.max() <= 1
        # every voxel was predicted (softmax probabilities sum to 1 > 0)
        assert np.all(pred.sum(axis=0) > 0.99)

    def test_save_segmentation(self, test_config, tmpdir):
        _, shape = _setup(test_config, str(tmpdir))
        test_config["loaders"]["test"]["slice_builder"]["patch_shape"] = [16, 64, 64]
        test_config["loaders"]["test"]["slice_builder"]["stride_shape"] = [16, 64, 64]
        test_config["predictor"]["save_segmentation"] = True
        _run_prediction(test_config)

        out = os.path.join(str(tmpdir), "test_predictions.h5")
        with h5py.File(out, "r") as f:
            assert f["predictions"].shape == shape  # channel dim dropped
            assert f["predictions"].dtype == np.uint16

    def test_performance_metric(self, test_config, tmpdir):
        _, shape = _setup(test_config, str(tmpdir))
        test_config["loaders"]["test"]["slice_builder"]["patch_shape"] = [16, 64, 64]
        test_config["loaders"]["test"]["slice_builder"]["stride_shape"] = [16, 64, 64]
        test_config["predictor"]["save_segmentation"] = True
        test_config["predictor"]["performance_metric"] = "mean_iou"
        test_config["predictor"]["gt_internal_path"] = "label"
        results = _run_prediction(test_config)
        assert len(results) == 1
        assert results[0] is not None
        assert all(np.isfinite(v) for v in results[0])

    def test_lazy_predictor_parity(self, test_config, tmpdir):
        _, shape = _setup(test_config, str(tmpdir))
        test_config["loaders"]["test"]["slice_builder"]["patch_shape"] = [16, 64, 64]
        test_config["loaders"]["test"]["slice_builder"]["stride_shape"] = [16, 64, 64]

        model = get_model(test_config["model"])
        variables = model.init(jax.random.PRNGKey(0))

        outputs = {}
        for predictor_name in ["StandardPredictor", "LazyPredictor"]:
            test_config["predictor"]["name"] = predictor_name
            predictor = get_predictor(model, variables, test_config)
            for loader in get_test_loaders(test_config):
                predictor(loader)
                predictor.finalize()
            with h5py.File(os.path.join(str(tmpdir), "test_predictions.h5"), "r") as f:
                outputs[predictor_name] = f["predictions"][:]

        assert np.any(outputs["LazyPredictor"] != 0)
        np.testing.assert_allclose(outputs["StandardPredictor"], outputs["LazyPredictor"], rtol=1e-5)


class TestStandardPredictor2D:
    def test_output_shape(self, test_config_2d, tmpdir):
        shape = (1, 96, 96)
        path = os.path.join(str(tmpdir), "test2d.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=np.random.rand(3, *shape))
        test_config_2d["loaders"]["test"]["file_paths"] = [path]
        test_config_2d["loaders"]["output_dir"] = str(tmpdir)
        test_config_2d["model"]["f_maps"] = 8
        test_config_2d["model"]["num_groups"] = 4
        test_config_2d["model"]["num_levels"] = 3
        _run_prediction(test_config_2d)

        out = os.path.join(str(tmpdir), "test2d_predictions.h5")
        assert os.path.exists(out)
        with h5py.File(out, "r") as f:
            assert f["predictions"].shape == (2, *shape)
