"""VGG16 feature extractor (torchvision-compatible) in flax.linen, NHWC.

Capability match to the reference's IPR feature backbone
(evaluation_pipeline.py:704-713): VGG16 truncated after the second FC layer
(fc7, 4096-d, post-ReLU — torchvision `classifier[:-1]` in eval mode).
Input: (B, 224, 224, 3) ImageNet-normalized.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_VGG16_LAYOUT = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512, "M")

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B,224,224,3) normalized → (B, 4096) fc7 features."""
        conv_idx = 0
        for item in _VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv_{conv_idx}",
                            dtype=self.dtype)(x)
                x = nn.relu(x)
                conv_idx += 1
        # torch flattens NCHW (C,H,W); transpose so ported fc weights line up
        B = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)  # (B, 512*7*7)
        x = nn.relu(nn.Dense(4096, name="fc6", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(4096, name="fc7", dtype=self.dtype)(x))
        return x


def imagenet_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) in [0,1] → ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std
