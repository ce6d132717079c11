"""Device mesh + sharding helpers (data parallelism over ICI).

TPU-native replacement for the reference's single-process DataParallel
(pytorch3dunet/unet3d/trainer.py:202-205): the global batch is sharded over a
1-D 'data' mesh axis, parameters are replicated, and XLA inserts the gradient
all-reduce (psum over ICI) during jit compilation of the train step. Multi-host
extends the same mesh over DCN via jax.distributed.initialize.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all (local) devices, batch axis = 'data'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def choose_data_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D mesh sized to the batch: the largest device count that divides the
    global batch (a replicated batch on an N-device mesh would run the whole
    computation N times — worse than single-device).

    Multi-host: the mesh must span every process's devices (a device-prefix
    mesh would exclude other hosts' local devices and
    make_array_from_process_local_data would fail), so the full global mesh is
    returned; per-host feeding is handled by shard_batch.
    """
    if devices is None:
        devices = jax.devices()
    if jax.process_count() > 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    n = len(devices)
    k = max(d for d in range(1, min(n, max(batch_size, 1)) + 1) if batch_size % d == 0)
    return Mesh(np.asarray(devices[:k]), (DATA_AXIS,))


def replicate(mesh: Mesh, tree):
    """Replicates a pytree across the mesh (params/opt state).

    Multi-host: every process must call this with the SAME values (true for
    seeded init and checkpoint loads); jax assembles the fully-replicated
    global arrays from the per-process copies.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
        )
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, ragged_replicated_ok: bool = False):
    """Shards arrays along their leading (batch) axis across the 'data' axis.

    Arrays whose batch dimension does not divide the mesh size (e.g. a ragged
    final batch) are replicated instead — correctness first, parallelism when
    the shapes allow it.

    Multi-host: each process contributes its LOCAL batch (global batch = sum
    over processes), assembled with make_array_from_process_local_data. A
    non-divisible local batch CANNOT be sharded and "replicating" it would
    stamp DIFFERENT per-host samples into one nominally-replicated array
    (silent parameter divergence) — that fallback is only taken when the
    caller vouches the per-host values are identical (`ragged_replicated_ok`,
    e.g. validation batches over host-identical files); otherwise it raises.
    """
    n = mesh.devices.size
    multihost = jax.process_count() > 1

    def _put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        if multihost:
            x = np.asarray(x)
            local = jax.local_device_count()
            if x.ndim > 0 and x.shape[0] % local == 0:
                return jax.make_array_from_process_local_data(NamedSharding(mesh, P(DATA_AXIS)), x)
            if not ragged_replicated_ok:
                raise ValueError(
                    f"multi-host batch axis {x.shape[0] if x.ndim else '()'} does not divide the "
                    f"{local} local devices and per-host batches differ: pick a batch size "
                    "divisible by the local device count (a replicated array built from "
                    "different per-host samples would silently diverge training)"
                )
            return jax.make_array_from_process_local_data(NamedSharding(mesh, P()), x)
        if x.ndim > 0 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(_put, tree)
