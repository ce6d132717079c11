from pytorch3dunet_tpu.models.unet import (
    ResidualUNet2D,
    ResidualUNet3D,
    ResidualUNetSE3D,
    UNet2D,
    UNet3D,
    UNetModel,
    get_model,
    is_model_2d,
)

__all__ = [
    "ResidualUNet2D",
    "ResidualUNet3D",
    "ResidualUNetSE3D",
    "UNet2D",
    "UNet3D",
    "UNetModel",
    "get_model",
    "is_model_2d",
]
