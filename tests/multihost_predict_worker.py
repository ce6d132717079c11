"""Worker for the 2-process multi-host PREDICTION proof (test_multihost.py).

Each process owns 2 virtual CPU devices, initializes jax.distributed from
P3DUNET_* env vars, and runs the predict flow: get_test_loaders shards the
test files per host (round-robin over the sorted expansion), the device sweep
shards each volume's patch grid over the LOCAL 2-device mesh, and each host
writes its own output files — prediction is embarrassingly parallel over
files, with no cross-host collectives.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores JAX_PLATFORMS
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(tmpdir):
    from pytorch3dunet_tpu.parallel.distributed import initialize_from_env

    assert initialize_from_env(), "P3DUNET_COORDINATOR must be set"
    assert jax.process_count() == 2 and jax.local_device_count() == 2

    from pytorch3dunet_tpu.datasets.utils import get_test_loaders
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.predict import get_predictor

    config = {
        "device": "cpu",
        "model_path": "",
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                  "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False},
        "predictor": {"name": "DeviceSlidingWindowPredictor"},
        "loaders": {
            "output_dir": os.path.join(tmpdir, "out"),
            "batch_size": 1,
            "raw_internal_path": "raw",
            "num_workers": 1,
            "test": {
                "file_paths": [os.path.join(tmpdir, f"v{i}.h5") for i in range(3)],
                "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 24, 24],
                                  "stride_shape": [8, 24, 24], "halo_shape": [0, 8, 8],
                                  "skip_shape_check": True},
                "transformer": {"raw": [{"name": "Standardize"},
                                        {"name": "ToTensor", "expand_dims": True}]},
            },
        },
    }

    model = get_model(dict(config["model"]))
    variables = model.init(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)

    names = []
    for loader in get_test_loaders(config):
        names.append(os.path.basename(loader.dataset.file_path))
        predictor(loader)
        predictor.finalize()

    print(f"PREDICTED {jax.process_index()} {','.join(sorted(names))}", flush=True)
    sweep = next(iter(predictor._sweeps.values()))
    assert sweep.mesh is not None and sweep.mesh.devices.size == jax.local_device_count()
    print(f"MESH {jax.process_index()} {sweep.mesh.devices.size}", flush=True)
    print("PREDICT_OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
