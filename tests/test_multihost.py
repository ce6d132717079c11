"""Multi-host data parallelism proof: 2 real processes over jax.distributed.

Launches 2 subprocesses (2 virtual CPU devices each -> 4 global), initializes
the coordination service via P3DUNET_COORDINATOR, and runs one full train
step over the global mesh: train files shard per host, the global batch is
assembled from per-host local batches, and the gradient psum crosses the
process boundary. Both processes must report the SAME loss.

This exercises parallel/distributed.py for real — the reference has no
multi-node support at all (SURVEY.md §2.3); this is the DCN extension.
"""

import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmpdir):
    tmpdir = str(tmpdir)
    rs = np.random.RandomState(0)
    for name in ("t0.h5", "t1.h5", "t2.h5", "v.h5"):
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=rs.rand(16, 64, 64))
            f.create_dataset("label", data=(rs.rand(16, 64, 64) > 0.5).astype(np.float32))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "P3DUNET_COORDINATOR": f"127.0.0.1:{port}",
            "P3DUNET_NUM_PROCESSES": "2",
            "P3DUNET_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"), tmpdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker timed out; partial output:\n{out}")
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # each host trained on a disjoint file subset (3 files round-robined)
    files = sorted(line.split()[-1] for out in outputs for line in out.splitlines()
                   if line.startswith("SHARDED_FILE"))
    assert files == ["t0.h5,t2.h5", "t1.h5"], files

    # unequal per-host sample counts were capped to the global minimum
    nbatches = sorted(int(line.split()[-1]) for out in outputs for line in out.splitlines()
                      if line.startswith("NBATCHES"))
    assert len(nbatches) == 2 and nbatches[0] == nbatches[1], nbatches

    # both hosts computed the identical global loss (grad psum crossed DCN)
    losses = sorted(line.split("loss=")[-1] for out in outputs for line in out.splitlines()
                    if line.startswith("MULTIHOST_OK"))
    assert len(losses) == 2, outputs
    assert losses[0] == losses[1], losses

    # the full UNetTrainer.fit() completed on both hosts with equal step counts
    iters = sorted(line.split("iters=")[-1] for out in outputs for line in out.splitlines()
                   if line.startswith("TRAINER_OK"))
    assert len(iters) == 2, outputs
    assert iters[0] == iters[1], iters


def test_two_process_distributed_predict(tmpdir):
    """Multi-host prediction: files shard per host (sorted round-robin), each
    host sweeps its volumes over its LOCAL 2-device mesh and writes its own
    outputs; the results equal a single-process prediction byte-for-shape."""
    tmpdir = str(tmpdir)
    rs = np.random.RandomState(1)
    volumes = {}
    for i in range(3):
        name = f"v{i}.h5"
        volumes[name] = rs.rand(16, 48, 48)
        with h5py.File(os.path.join(tmpdir, name), "w") as f:
            f.create_dataset("raw", data=volumes[name])
    os.makedirs(os.path.join(tmpdir, "out"), exist_ok=True)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "P3DUNET_COORDINATOR": f"127.0.0.1:{port}",
            "P3DUNET_NUM_PROCESSES": "2",
            "P3DUNET_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_predict_worker.py"), tmpdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker timed out; partial output:\n{out}")
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # disjoint round-robin over the sorted file list: v0,v2 / v1
    predicted = sorted(line.split()[-1] for out in outputs for line in out.splitlines()
                       if line.startswith("PREDICTED"))
    assert predicted == ["v0.h5,v2.h5", "v1.h5"], predicted
    # each process swept over its LOCAL 2-device mesh
    meshes = [int(line.split()[-1]) for out in outputs for line in out.splitlines()
              if line.startswith("MESH")]
    assert meshes == [2, 2], meshes

    # every output exists and equals the single-process prediction
    import jax

    from pytorch3dunet_tpu.datasets.utils import get_test_loaders
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.predict import get_predictor

    model_cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "layer_order": "gcr",
                 "f_maps": 8, "num_groups": 4, "num_levels": 2, "final_sigmoid": False}
    config = {
        "device": "cpu",
        "model_path": "",
        "model": model_cfg,
        "predictor": {"name": "DeviceSlidingWindowPredictor", "shard": False},
        "loaders": {
            "output_dir": os.path.join(tmpdir, "oracle"),
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
    os.makedirs(config["loaders"]["output_dir"], exist_ok=True)
    model = get_model(dict(model_cfg))
    variables = model.init(jax.random.PRNGKey(0))
    predictor = get_predictor(model, variables, config)
    for loader in get_test_loaders(config):
        predictor(loader)
        predictor.finalize()

    for i in range(3):
        worker_out = os.path.join(tmpdir, "out", f"v{i}_predictions.h5")
        oracle_out = os.path.join(tmpdir, "oracle", f"v{i}_predictions.h5")
        assert os.path.exists(worker_out), f"missing {worker_out}"
        with h5py.File(worker_out, "r") as a, h5py.File(oracle_out, "r") as b:
            np.testing.assert_allclose(a["predictions"][:], b["predictions"][:], atol=2e-5)
