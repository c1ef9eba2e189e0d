from ddpo_tpu.models.unet import UNet2DCondition, UNetConfig, SD14_UNET
from ddpo_tpu.models.vae import AutoencoderKL, VAEConfig, SD14_VAE, DiagonalGaussian
from ddpo_tpu.models.clip import CLIPTextModel, CLIPTextConfig, SD14_TEXT

__all__ = [
    "UNet2DCondition",
    "UNetConfig",
    "SD14_UNET",
    "AutoencoderKL",
    "VAEConfig",
    "SD14_VAE",
    "DiagonalGaussian",
    "CLIPTextModel",
    "CLIPTextConfig",
    "SD14_TEXT",
]
