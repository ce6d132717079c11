from pytorch3dunet_tpu.ops.interp import resize_spatial

__all__ = ["resize_spatial"]
