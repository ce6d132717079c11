"""Multi-host entry: extend the data mesh over DCN via jax.distributed.

The reference has no multi-node support at all (SURVEY.md §2.3); this is the
TPU-native extension: every host runs the same `train3dunet` invocation, JAX
wires the hosts into one global device set, and the existing data-parallel
mesh (parallel/mesh.py) simply spans all global devices — gradient psum rides
ICI within a slice and DCN across slices.

Usage (per host):
    P3DUNET_COORDINATOR=host0:1234 P3DUNET_NUM_PROCESSES=4 P3DUNET_PROCESS_ID=k \
        train3dunet --config ...

or call `initialize_from_env()` before building the trainer. On single-host
runs this is a no-op.
"""

import os

from pytorch3dunet_tpu.utils import get_logger

logger = get_logger("Distributed")


def initialize_from_env() -> bool:
    """Initializes jax.distributed from P3DUNET_* env vars; returns True when
    a multi-process runtime was set up."""
    coordinator = os.environ.get("P3DUNET_COORDINATOR")
    if not coordinator:
        return False
    import jax

    num_processes = int(os.environ["P3DUNET_NUM_PROCESSES"])
    process_id = int(os.environ["P3DUNET_PROCESS_ID"])
    logger.info(f"jax.distributed.initialize({coordinator}, {num_processes}, {process_id})")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(f"process {jax.process_index()}/{jax.process_count()}: "
                f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    return True


def shard_file_paths(file_paths: list, process_id: int | None = None, num_processes: int | None = None,
                     allow_empty: bool = False) -> list:
    """Round-robin split of input files across hosts — each host feeds its own
    local devices from disjoint volumes (per-host sharded HDF5 readers).

    Callers must pass a deterministically ordered list (sort after directory
    expansion) so every host computes the same assignment. `allow_empty`:
    prediction shards may be empty (a host with no files writes nothing);
    training shards wrap instead so every host can sample.
    """
    import jax

    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    if num_processes <= 1:
        return list(file_paths)
    mine = [p for i, p in enumerate(file_paths) if i % num_processes == process_id]
    if not mine and allow_empty:
        return []
    if not mine:
        # fewer files than hosts: wrap the assignment so a data-less host
        # shares ONE volume instead of duplicating the whole corpus (which
        # would double-weight every sample and skew the training sampling)
        mine = [file_paths[process_id % len(file_paths)]]
        logger.warning(
            f"Multi-host: {len(file_paths)} train files for {num_processes} processes — "
            f"process {process_id} shares {mine[0]} with another host. Provide at least "
            "one file per host for disjoint sampling."
        )
    return mine
