"""Mesh/sharding helpers + the multi-chip dry run on the virtual CPU mesh."""

import importlib.util

import jax
import numpy as np
import pytest

from pytorch3dunet_tpu.parallel import choose_data_mesh, data_mesh, replicate, shard_batch
from pytorch3dunet_tpu.parallel.distributed import shard_file_paths


class TestMesh:
    def test_data_mesh_spans_devices(self):
        mesh = data_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("data",)

    @pytest.mark.parametrize("batch,expected", [(8, 8), (4, 4), (6, 6), (1, 1), (3, 3), (16, 8)])
    def test_choose_mesh_size(self, batch, expected):
        # 8 virtual devices in the test env
        mesh = choose_data_mesh(batch)
        assert mesh.devices.size == expected

    def test_shard_batch_divisible(self):
        mesh = choose_data_mesh(8)
        x = np.random.rand(8, 4, 4).astype(np.float32)
        sharded = shard_batch(mesh, x)
        assert sharded.sharding.num_devices == 8
        np.testing.assert_array_equal(np.asarray(sharded), x)

    def test_shard_batch_ragged_replicates(self):
        mesh = choose_data_mesh(8)
        x = np.random.rand(3, 4).astype(np.float32)  # not divisible by 8
        sharded = shard_batch(mesh, x)
        np.testing.assert_array_equal(np.asarray(sharded), x)

    def test_replicated_params_gradient_psum(self):
        """DP semantics: grads of a sharded-batch loss match the single-device grads."""
        mesh = choose_data_mesh(8)
        w = np.random.RandomState(0).rand(4, 4).astype(np.float32)
        x = np.random.RandomState(1).rand(8, 4).astype(np.float32)

        def loss(w, x):
            return ((x @ w) ** 2).mean()

        g_single = jax.grad(loss)(w, x)

        w_r = replicate(mesh, w)
        x_s = shard_batch(mesh, x)
        g_sharded = jax.jit(jax.grad(loss))(w_r, x_s)
        np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5)


class TestDistributedHelpers:
    def test_shard_file_paths(self):
        paths = [f"f{i}.h5" for i in range(5)]
        assert shard_file_paths(paths, 0, 2) == ["f0.h5", "f2.h5", "f4.h5"]
        assert shard_file_paths(paths, 1, 2) == ["f1.h5", "f3.h5"]
        assert shard_file_paths(paths, 0, 1) == paths

    def test_never_empty(self):
        assert shard_file_paths(["a.h5"], 3, 4) == ["a.h5"]


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must pass on the 8-device CPU mesh."""
    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    spec = importlib.util.spec_from_file_location("graft_entry2", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 32, 64, 64, 1)
