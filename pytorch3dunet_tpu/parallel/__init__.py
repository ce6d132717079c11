from pytorch3dunet_tpu.parallel.mesh import (
    choose_data_mesh,
    data_mesh,
    replicate,
    shard_batch,
)

__all__ = ["choose_data_mesh", "data_mesh", "replicate", "shard_batch"]
