from pytorch3dunet_tpu.augment import transforms

__all__ = ["transforms"]
