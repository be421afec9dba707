from .clip import CLIPVisionConfig, CLIPVisionTower, clip_vit_l14_config, tiny_clip_config
from .inception import InceptionV3Features, inception_preprocess
from .resnet import ResNet, ResNetConfig, resnet_feature_dim
from .unet import UNet2DCondition, UNetConfig, sd14_unet_config, tiny_unet_config
from .vae import AutoencoderKL, VAEConfig, sd_vae_config, tiny_vae_config
from .vgg import VGG16Features, imagenet_normalize

__all__ = [
    "CLIPVisionConfig", "CLIPVisionTower", "clip_vit_l14_config", "tiny_clip_config",
    "InceptionV3Features", "inception_preprocess",
    "ResNet", "ResNetConfig", "resnet_feature_dim",
    "UNet2DCondition", "UNetConfig", "sd14_unet_config", "tiny_unet_config",
    "AutoencoderKL", "VAEConfig", "sd_vae_config", "tiny_vae_config",
    "VGG16Features", "imagenet_normalize",
]
