"""CLIP vision tower (ViT) with projection, in flax.linen.

Capability match to the reference's frozen `ImageEncoder` wrapper around HF
`CLIPVisionModelWithProjection` (src/models/image_encoder.py:17-88):
  * `image_embeds(x)`   → pooled, projected embedding (B, projection_dim)
  * `last_hidden_state(x)` → final encoder-layer output (B, 257, hidden) —
    NOTE: like HF `hidden_states[-1]`, this is BEFORE post_layernorm, which
    is what the reference feeds to ImageProjectionPlus (image_encoder.py:88).

Defaults are ViT-L/14 (openai/clip-vit-large-patch14, the config the
reference ships: configs/train_ip.yaml:19). Activation is QuickGELU.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        kw = dict(dtype=c.dtype, param_dtype=c.param_dtype)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1", **kw)(x)
        B, S, D = h.shape
        hd = D // c.num_heads
        q = nn.Dense(D, name="q_proj", **kw)(h).reshape(B, S, c.num_heads, hd)
        k = nn.Dense(D, name="k_proj", **kw)(h).reshape(B, S, c.num_heads, hd)
        v = nn.Dense(D, name="v_proj", **kw)(h).reshape(B, S, c.num_heads, hd)
        z = dot_product_attention(q, k, v).reshape(B, S, D)
        x = x + nn.Dense(D, name="out_proj", **kw)(z)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2", **kw)(x)
        h = nn.Dense(c.mlp_dim, name="fc1", **kw)(h)
        h = quick_gelu(h)
        h = nn.Dense(D, name="fc2", **kw)(h)
        return x + h


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    def setup(self):
        c = self.cfg
        kw = dict(dtype=c.dtype, param_dtype=c.param_dtype)
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        self.patch_embedding = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=c.patch_size,
            use_bias=False,
            padding="VALID",
            name="patch_embedding",
            **kw,
        )
        self.position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.num_positions, c.hidden_size),
        )
        self.pre_layernorm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="pre_layrnorm", **kw
        )
        self.layers = [
            CLIPEncoderLayer(c, name=f"layers_{i}") for i in range(c.num_layers)
        ]
        self.post_layernorm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="post_layernorm", **kw
        )
        self.visual_projection = nn.Dense(
            c.projection_dim, use_bias=False, name="visual_projection", **kw
        )

    def _embed(self, pixel_values):
        """pixel_values: (B, H, W, 3), CLIP-preprocessed (mean/std normalized)."""
        c = self.cfg
        x = pixel_values.astype(c.dtype)
        patches = self.patch_embedding(x)  # (B, h, w, D)
        B = patches.shape[0]
        patches = patches.reshape(B, -1, c.hidden_size)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(c.dtype), (B, 1, c.hidden_size)
        )
        h = jnp.concatenate([cls, patches], axis=1)
        h = h + self.position_embedding.astype(c.dtype)[None]
        return self.pre_layernorm(h)

    def last_hidden_state(self, pixel_values):
        h = self._embed(pixel_values)
        for layer in self.layers:
            h = layer(h)
        return h

    def image_embeds(self, pixel_values):
        h = self.last_hidden_state(pixel_values)
        pooled = self.post_layernorm(h[:, 0, :])
        return self.visual_projection(pooled)

    def __call__(self, pixel_values):
        return self.image_embeds(pixel_values)


def clip_vit_l14_config(**overrides) -> CLIPVisionConfig:
    return CLIPVisionConfig(**overrides)


def tiny_clip_config(**overrides) -> CLIPVisionConfig:
    base = dict(
        image_size=32,
        patch_size=8,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        mlp_dim=64,
        projection_dim=16,
        dtype=jnp.float32,
    )
    base.update(overrides)
    return CLIPVisionConfig(**base)
