"""DSB2018 dataset + predictor end-to-end tests (PNG image folders)."""

import os

import h5py
import imageio.v2 as imageio
import jax
import numpy as np

from pytorch3dunet_tpu.datasets.dsb import DSB2018Dataset, dsb_prediction_collate
from pytorch3dunet_tpu.datasets.loader import DataLoader
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.predictor import DSB2018Predictor


def _make_dsb_folder(tmpdir, phase_dir, n=3, with_masks=True):
    root = os.path.join(str(tmpdir), phase_dir)
    os.makedirs(os.path.join(root, "images"))
    rs = np.random.RandomState(0)
    for i in range(n):
        img = (rs.rand(64, 64) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(root, "images", f"img{i}.png"), img)
    if with_masks:
        os.makedirs(os.path.join(root, "masks"))
        for i in range(n):
            mask = (rs.rand(64, 64) > 0.5).astype(np.uint8) * 255
            imageio.imwrite(os.path.join(root, "masks", f"img{i}.png"), mask)
    return root


TRANSFORMER = {
    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
    "label": [{"name": "ToTensor", "expand_dims": True, "normalize": True}],
}


class TestDSBDataset:
    def test_train_phase(self, tmpdir):
        root = _make_dsb_folder(tmpdir, "train")
        ds = DSB2018Dataset(root, "train", TRANSFORMER)
        assert len(ds) == 3
        img, mask = ds[0]
        # singleton-z 2D convention: (C, 1, H, W) after expand_dims + ToTensor
        assert img.shape == (1, 1, 64, 64)
        assert mask.shape == img.shape

    def test_test_phase_returns_paths(self, tmpdir):
        root = _make_dsb_folder(tmpdir, "test", with_masks=False)
        ds = DSB2018Dataset(root, "test", {"raw": TRANSFORMER["raw"]})
        img, path = ds[0]
        assert isinstance(path, str) and path.endswith(".png")

    def test_collate(self, tmpdir):
        root = _make_dsb_folder(tmpdir, "coll", with_masks=False)
        ds = DSB2018Dataset(root, "test", {"raw": TRANSFORMER["raw"]})
        batch = dsb_prediction_collate([ds[0], ds[1]])
        imgs, paths = batch
        assert imgs.shape[0] == 2
        assert len(paths) == 2


class TestDSBPredictor:
    def test_end_to_end(self, tmpdir):
        root = _make_dsb_folder(tmpdir, "pred", with_masks=False)
        out_dir = os.path.join(str(tmpdir), "out")
        os.makedirs(out_dir)

        model = get_model({"name": "UNet2D", "in_channels": 1, "out_channels": 1,
                           "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True})
        variables = model.init(jax.random.PRNGKey(0))

        ds = DSB2018Dataset(root, "test", {"raw": TRANSFORMER["raw"]})
        loader = DataLoader(ds, batch_size=2, collate_fn=ds.prediction_collate)

        predictor = DSB2018Predictor(model, variables, out_dir, device="cpu")
        predictor(loader)
        predictor.finalize()

        outputs = [f for f in os.listdir(out_dir) if f.endswith("_predictions.h5")]
        assert len(outputs) == 3
        with h5py.File(os.path.join(out_dir, outputs[0]), "r") as f:
            assert "predictions" in f
            assert "segmentation" in f
            assert f["predictions"].shape == (64, 64)
            assert f["segmentation"].dtype == np.uint16

    def test_pad_to_multiple_bounds_compiles(self, tmpdir):
        # variable-size images: shape bucketing pads H/W up to a multiple so
        # XLA compiles once per bucket, not once per image size
        root = os.path.join(str(tmpdir), "var")
        os.makedirs(os.path.join(root, "images"))
        rs = np.random.RandomState(1)
        sizes = [(50, 70), (60, 45), (64, 64)]
        for i, (h, w) in enumerate(sizes):
            imageio.imwrite(os.path.join(root, "images", f"img{i}.png"),
                            (rs.rand(h, w) * 255).astype(np.uint8))
        out_dir = os.path.join(str(tmpdir), "out_var")
        os.makedirs(out_dir)

        model = get_model({"name": "UNet2D", "in_channels": 1, "out_channels": 1,
                           "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True})
        variables = model.init(jax.random.PRNGKey(0))
        ds = DSB2018Dataset(root, "test", {"raw": TRANSFORMER["raw"]})
        loader = DataLoader(ds, batch_size=1, collate_fn=ds.prediction_collate)

        predictor = DSB2018Predictor(model, variables, out_dir, device="cpu", pad_to_multiple=32)
        predictor(loader)
        predictor.finalize()

        # predictions keep the ORIGINAL image shapes
        shapes = set()
        for f_name in os.listdir(out_dir):
            with h5py.File(os.path.join(out_dir, f_name), "r") as f:
                shapes.add(f["predictions"].shape)
        assert shapes == set(sizes)
        # (64,96) and 2x (64,64) padded buckets -> 2 compiled programs, not 3
        assert predictor._forward_fn._cache_size() == 2


class TestDSBTraining:
    def test_train_cli_path_with_blobs_mask(self, tmpdir):
        """Full trainer over DSB folders: 2D loaders + BlobsToMask targets +
        checkpointing (the 2DUnet_dsb2018 recipe shape)."""
        from pytorch3dunet_tpu.trainer import create_trainer

        train_root = _make_dsb_folder(tmpdir, "train")
        val_root = _make_dsb_folder(tmpdir, "val")
        ckpt = os.path.join(str(tmpdir), "ckpt")
        tf = {
            "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
            "label": [{"name": "BlobsToMask", "append_label": False},
                      {"name": "ToTensor", "expand_dims": True}],
        }
        config = {
            "device": "cpu",
            "model": {"name": "UNet2D", "in_channels": 1, "out_channels": 1, "layer_order": "gcr",
                      "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": True},
            "trainer": {"checkpoint_dir": ckpt, "resume": None, "validate_after_iters": 2,
                        "log_after_iters": 2, "max_num_epochs": 2, "max_num_iterations": 4,
                        "eval_score_higher_is_better": True},
            "optimizer": {"learning_rate": 2e-4},
            "loss": {"name": "BCEDiceLoss"},
            "eval_metric": {"name": "DiceCoefficient"},
            "lr_scheduler": None,
            "loaders": {"dataset": "DSB2018Dataset", "batch_size": 1, "num_workers": 1,
                        "train": {"file_paths": [train_root], "transformer": tf},
                        "val": {"file_paths": [val_root], "transformer": tf}},
        }
        trainer = create_trainer(config)
        trainer.fit()
        assert os.path.exists(os.path.join(ckpt, "last_checkpoint.pytorch"))
        assert np.isfinite(trainer.best_eval_score)
