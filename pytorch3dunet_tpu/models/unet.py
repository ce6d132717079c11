"""U-Net model zoo: UNet3D, ResidualUNet3D, ResidualUNetSE3D, UNet2D, ResidualUNet2D.

Same model families and constructor schema as the reference
(pytorch3dunet/unet3d/model.py), rebuilt as Flax modules over channels-last
tensors. A `UNetModel` wrapper owns the linen module plus the metadata the
trainer/predictor need (out_channels, 2d/3d, segmentation-vs-regression), and
exposes functional `init`/`apply` — parameters live in pytrees, not objects.

Input layout: (N, D, H, W, C) for 3D models, (N, H, W, C) for 2D models.
`apply` returns (probabilities, logits); the loss always consumes logits
(mirroring trainer.py:364-365 in the reference).
"""

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch3dunet_tpu.models.blocks import Decoder, Encoder, conv_kernel_init
from pytorch3dunet_tpu.ops import packed as packed_ops
from pytorch3dunet_tpu.ops.conv import conv_nd
from pytorch3dunet_tpu.utils import get_class, get_logger, number_of_features_per_level

logger = get_logger("UNetModel")

_DTYPES = {
    None: None,
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "fp32": jnp.float32,
}


def _resolve_upsample(upsample, basic_module: str) -> tuple[str | None, bool]:
    """Resolves ('default' | mode | None) into (mode, concat) per reference
    Decoder.__init__ (buildingblocks.py:427-464)."""
    concat = True
    if upsample is not None and upsample != "none":
        if upsample == "default":
            if basic_module == "DoubleConv":
                return "nearest", True
            return "deconv", False
        return upsample, concat
    return None, concat


class UNetModule(nn.Module):
    """Encoder/decoder U-Net skeleton (reference AbstractUNet, model.py:7-149)."""

    out_channels: int
    final_sigmoid: bool = True
    basic_module: str = "DoubleConv"
    f_maps: tuple = (64, 128, 256, 512)
    layer_order: str = "gcr"
    num_groups: int = 8
    is_segmentation: bool = True
    conv_kernel_size: int | tuple = 3
    pool_kernel_size: int | tuple = 2
    conv_padding: int | tuple = 1
    conv_upscale: int = 2
    upsample: str | None = "default"
    dropout_prob: float | tuple = 0.1
    is3d: bool = True
    dtype: jnp.dtype | None = None
    remat: bool = False

    def setup(self):
        assert len(self.f_maps) > 1, "Required at least 2 levels in the U-Net"
        if "g" in self.layer_order:
            assert self.num_groups is not None, "num_groups must be specified if GroupNorm is used"
        rank = 3 if self.is3d else 2

        # rematerialize per-level blocks: trades recompute for activation HBM,
        # allowing larger batches/patches (jax.checkpoint per encoder/decoder)
        encoder_cls = nn.remat(Encoder) if self.remat else Encoder
        decoder_cls = nn.remat(Decoder) if self.remat else Decoder

        encoders = []
        for i, out_feature_num in enumerate(self.f_maps):
            encoders.append(
                encoder_cls(
                    out_feature_num,
                    basic_module=self.basic_module,
                    conv_kernel_size=self.conv_kernel_size,
                    apply_pooling=i > 0,
                    pool_kernel_size=self.pool_kernel_size,
                    conv_layer_order=self.layer_order,
                    num_groups=self.num_groups,
                    padding=self.conv_padding,
                    upscale=self.conv_upscale,
                    dropout_prob=self.dropout_prob,
                    spatial_rank=rank,
                    dtype=self.dtype,
                    name=f"encoder{i}",
                )
            )
        self.encoders = encoders

        mode, concat = _resolve_upsample(self.upsample, self.basic_module)
        reversed_f_maps = list(reversed(self.f_maps))
        decoders = []
        for i in range(len(reversed_f_maps) - 1):
            decoders.append(
                decoder_cls(
                    reversed_f_maps[i + 1],
                    basic_module=self.basic_module,
                    conv_kernel_size=self.conv_kernel_size,
                    scale_factor=self.pool_kernel_size,
                    conv_layer_order=self.layer_order,
                    num_groups=self.num_groups,
                    padding=self.conv_padding,
                    upsample_mode=mode,
                    concat=concat,
                    dropout_prob=self.dropout_prob,
                    spatial_rank=rank,
                    dtype=self.dtype,
                    name=f"decoder{i}",
                )
            )
        self.decoders = decoders

        self.final_conv = conv_nd(
            self.out_channels,
            kernel_size=1,
            padding=0,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            name="final_conv",
            spatial_rank=rank,
        )

    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # opt-in lane-packed internal layout (N, D, H, W*C); see ops/packed.py
        # for why it is off by default on current XLA
        if packed_ops.enabled():
            x = packed_ops.pack(x)

        encoders_features = []
        for encoder in self.encoders:
            x = encoder(x, train=train)
            encoders_features.insert(0, x)
        # drop the bottleneck output: it is the decoder input, not a skip
        encoders_features = encoders_features[1:]

        for decoder, encoder_features in zip(self.decoders, encoders_features):
            x = decoder(encoder_features, x, train=train)

        logits = packed_ops.unpack(self.final_conv(x)).astype(jnp.float32)

        if self.is_segmentation:
            if self.final_sigmoid:
                probs = jax.nn.sigmoid(logits)
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            return probs, logits
        return logits, logits


class UNetModel:
    """Owns a UNetModule + metadata; functional init/apply over param pytrees."""

    basic_module = "DoubleConv"
    is3d = True
    default_num_levels = 4

    def __init__(
        self,
        in_channels,
        out_channels,
        final_sigmoid=True,
        f_maps=64,
        layer_order="gcr",
        num_groups=8,
        num_levels=None,
        is_segmentation=True,
        conv_kernel_size=3,
        pool_kernel_size=2,
        conv_padding=1,
        conv_upscale=2,
        upsample="default",
        dropout_prob=0.1,
        dtype=None,
        remat=False,
        **kwargs,
    ):
        if num_levels is None:
            num_levels = self.default_num_levels
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, num_levels=num_levels)
        assert isinstance(f_maps, (list, tuple))

        self.in_channels = in_channels
        self.out_channels = out_channels
        self.is_segmentation = is_segmentation
        self.final_sigmoid = final_sigmoid
        self.f_maps = tuple(f_maps)
        self.pool_kernel_size = pool_kernel_size
        if isinstance(dtype, str) or dtype is None:
            dtype = _DTYPES[dtype]
        self.dtype = dtype

        self.module = UNetModule(
            out_channels=out_channels,
            final_sigmoid=final_sigmoid,
            basic_module=self.basic_module,
            f_maps=self.f_maps,
            layer_order=layer_order,
            num_groups=num_groups,
            is_segmentation=is_segmentation,
            conv_kernel_size=conv_kernel_size,
            pool_kernel_size=pool_kernel_size,
            conv_padding=conv_padding,
            conv_upscale=conv_upscale,
            upsample=upsample,
            dropout_prob=dropout_prob,
            is3d=self.is3d,
            dtype=dtype,
            remat=remat,
        )

    @property
    def spatial_rank(self) -> int:
        return 3 if self.is3d else 2

    def example_input(self, patch_shape=None, batch_size: int = 1) -> jnp.ndarray:
        if patch_shape is None:
            # smallest shape divisible by the pooling factor at every level
            factor = self.pool_kernel_size if isinstance(self.pool_kernel_size, int) else max(self.pool_kernel_size)
            side = factor ** (len(self.f_maps) - 1)
            patch_shape = (side * 2,) * self.spatial_rank
        return jnp.zeros((batch_size, *patch_shape, self.in_channels), dtype=jnp.float32)

    def init(self, rng, patch_shape=None, batch_size: int = 1):
        """Initializes and returns the variables dict ({'params': ...[, 'batch_stats': ...]})."""
        x = self.example_input(patch_shape, batch_size)
        return self.module.init(rng, x, train=False)

    def apply(self, variables, x, train: bool = False, rngs=None, mutable=False):
        """Runs the forward pass; returns ((probs, logits)[, updated_state])."""
        return self.module.apply(variables, x, train=train, rngs=rngs, mutable=mutable)

    def __call__(self, variables, x, train: bool = False, rngs=None):
        return self.apply(variables, x, train=train, rngs=rngs)


class UNet3D(UNetModel):
    """3D U-Net (Cicek et al., arXiv:1606.06650): DoubleConv blocks, nearest
    upsampling, concat joining. Reference: model.py:152-190."""

    basic_module = "DoubleConv"
    is3d = True
    default_num_levels = 4


class ResidualUNet3D(UNetModel):
    """Residual 3D U-Net (arXiv:1706.00120): ResNet blocks, deconv upsampling,
    summation joining. Reference: model.py:193-234."""

    basic_module = "ResNetBlock"
    is3d = True
    default_num_levels = 5


class ResidualUNetSE3D(UNetModel):
    """Residual 3D U-Net with squeeze-and-excitation blocks. Reference: model.py:237-278."""

    basic_module = "ResNetBlockSE"
    is3d = True
    default_num_levels = 5


class UNet2D(UNetModel):
    """2D U-Net (Ronneberger et al., arXiv:1505.04597). Reference: model.py:281-318."""

    basic_module = "DoubleConv"
    is3d = False
    default_num_levels = 4


class ResidualUNet2D(UNetModel):
    """Residual 2D U-Net. Reference: model.py:321-358."""

    basic_module = "ResNetBlock"
    is3d = False
    default_num_levels = 5


def get_model(model_config: dict) -> UNetModel:
    """Resolves the model class from config['name'] (reference model.py:361-363)."""
    model_class = get_class(model_config["name"], modules=["pytorch3dunet_tpu.models.unet"])
    config = dict(model_config)
    config.pop("name", None)
    return model_class(**config)


def is_model_2d(model: UNetModel) -> bool:
    return not model.is3d


def count_parameters(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables.get("params", variables)))
