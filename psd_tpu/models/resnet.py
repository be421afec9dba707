"""ResNet-18/34/50/101 (torchvision-compatible) in flax.linen, NHWC.

Capability match to the reference's MES classifier/judge backbones
(src/classification/model.py:133-210, model_regression.py): ImageNet-style
ResNet with a dropout classification head (→ num_classes) or a regression
head (→ 1 scalar). BatchNorm carries running statistics in `batch_stats`
(training updates them; evaluation uses them, as torch .eval() does).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import flax.linen as nn
import jax.numpy as jnp

_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    channels: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        Norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        h = nn.Conv(self.channels, (3, 3), self.strides, padding=1,
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        h = Norm(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv2", dtype=self.dtype)(h)
        h = Norm(name="bn2")(h)
        if x.shape[-1] != self.channels or self.strides != 1:
            x = nn.Conv(self.channels, (1, 1), self.strides, use_bias=False,
                        name="downsample_conv", dtype=self.dtype)(x)
            x = Norm(name="downsample_bn")(x)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output = channels * 4
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        Norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        out_ch = self.channels * 4
        h = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        h = nn.relu(Norm(name="bn1")(h))
        h = nn.Conv(self.channels, (3, 3), self.strides, padding=1,
                    use_bias=False, name="conv2", dtype=self.dtype)(h)
        h = nn.relu(Norm(name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3",
                    dtype=self.dtype)(h)
        h = Norm(name="bn3")(h)
        if x.shape[-1] != out_ch or self.strides != 1:
            x = nn.Conv(out_ch, (1, 1), self.strides, use_bias=False,
                        name="downsample_conv", dtype=self.dtype)(x)
            x = Norm(name="downsample_bn")(x)
        return nn.relu(x + h)


@dataclass(frozen=True)
class ResNetConfig:
    variant: str = "resnet18"
    num_classes: int = 4
    head: str = "classify"  # "classify" | "regress" | "features"
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32


class ResNet(nn.Module):
    config: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        kind, layers = _SPECS[cfg.variant]
        Block = BasicBlock if kind == "basic" else Bottleneck

        h = nn.Conv(64, (7, 7), 2, padding=3, use_bias=False, name="conv1",
                    dtype=cfg.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=cfg.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, (n_blocks, width) in enumerate(zip(layers, (64, 128, 256, 512))):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                h = Block(width, strides, dtype=cfg.dtype,
                          name=f"layer{i + 1}_{j}")(h, train)

        feats = jnp.mean(h, axis=(1, 2))  # global average pool
        if cfg.head == "features":
            return feats
        feats = nn.Dropout(cfg.dropout, deterministic=not train)(feats)
        if cfg.head == "regress":
            return nn.Dense(1, name="fc", dtype=cfg.dtype)(feats)[:, 0]
        return nn.Dense(cfg.num_classes, name="fc", dtype=cfg.dtype)(feats)


def resnet_feature_dim(variant: str) -> int:
    kind, _ = _SPECS[variant]
    return 512 if kind == "basic" else 2048
