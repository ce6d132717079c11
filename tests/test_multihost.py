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
