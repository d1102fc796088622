"""Style-transfer (GAN) workload: generators/discriminators, GAN losses,
image pool, pix2pix/cyclegan training."""
from .networks import (
    ResnetGenerator,
    ResnetBlock,
    NLayerDiscriminator,
    PixelDiscriminator,
    gan_loss,
    gradient_penalty,
    define_g,
    define_d,
    reflection_pad,
)
from .image_pool import ImagePool
from .models import NetState, make_net_state, make_pix2pix_steps, make_cyclegan_steps
from .data import AlignedDataset, UnalignedDataset, SyntheticPairs, apply_direction

__all__ = [
    "ResnetGenerator",
    "ResnetBlock",
    "NLayerDiscriminator",
    "PixelDiscriminator",
    "gan_loss",
    "gradient_penalty",
    "define_g",
    "define_d",
    "reflection_pad",
    "ImagePool",
    "NetState",
    "make_net_state",
    "make_pix2pix_steps",
    "make_cyclegan_steps",
    "AlignedDataset",
    "UnalignedDataset",
    "SyntheticPairs",
    "apply_direction",
]
