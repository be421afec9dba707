"""InceptionV3 pool3 feature extractor (torchvision-compatible), flax NHWC.

Capability match to the reference's FID backbone (torchmetrics
FrechetInceptionDistance with feature=2048, evaluation_pipeline.py:577-599).
Every conv is BasicConv2d = bias-free conv + BatchNorm(eps=1e-3) + ReLU;
inference uses running statistics. Input: (B, 299, 299, 3) in [-1, 1]
(inception's own (x-0.5)/0.5 normalization applied by the caller via
`inception_preprocess`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    channels: int
    kernel: Tuple[int, int] = (1, 1)
    strides: int = 1
    padding: Tuple[int, int] | int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        else:
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.channels, self.kernel, self.strides, padding=pad,
                    use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn",
                         dtype=self.dtype)(x)
        return nn.relu(x)


def _avg_pool_3x3_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(64, name="branch1x1")(x)
        b5 = C(48, name="branch5x5_1")(x)
        b5 = C(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = C(64, name="branch3x3dbl_1")(x)
        b3 = C(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = C(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = C(self.pool_features, name="branch_pool")(_avg_pool_3x3_same(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = C(64, name="branch3x3dbl_1")(x)
        bd = C(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = C(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.c7
        b1 = C(192, name="branch1x1")(x)
        b7 = C(c7, name="branch7x7_1")(x)
        b7 = C(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = C(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = C(c7, name="branch7x7dbl_1")(x)
        bd = C(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = C(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = C(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = C(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = C(192, name="branch_pool")(_avg_pool_3x3_same(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(192, name="branch3x3_1")(x)
        b3 = C(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = C(192, name="branch7x7x3_1")(x)
        b7 = C(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = C(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = C(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(320, name="branch1x1")(x)
        b3 = C(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                C(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                C(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = C(448, name="branch3x3dbl_1")(x)
        bd = C(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                C(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                C(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = C(192, name="branch_pool")(_avg_pool_3x3_same(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(B, 299, 299, 3) in [-1,1] → (B, 2048) pool3 features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        x = C(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = C(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = C(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = C(80, name="Conv2d_3b_1x1")(x)
        x = C(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def inception_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) in [0,1] → bilinear 299² resize + [-1,1] scaling."""
    B = images.shape[0]
    x = jax.image.resize(images, (B, 299, 299, 3), method="bilinear")
    return x * 2.0 - 1.0
