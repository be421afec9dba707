"""IP-Adapter image projections.

ImageProjection     — src/models/image_encoder.py:91-133: Linear(clip_dim →
                      D·N) → reshape N tokens → LayerNorm(D).
ImageProjectionPlus — src/models/image_encoder.py:136-228: Perceiver
                      Resampler: learnable latent queries, depth-2
                      {LN(latents) → MHA(q=latents, kv=patches) → res,
                       LN → FF(4×, GELU) → res}, LayerNorm out. Note the
                      reference does NOT normalize the key/value patches.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..models.layers import gelu
from .purifier import MultiheadAttention


class ImageProjection(nn.Module):
    cross_attention_dim: int = 768
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        """(B, clip_embedding_dim) → (B, N, D)."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Dense(
            self.cross_attention_dim * self.num_tokens, name="projection", **kw
        )(image_embeds)
        h = h.reshape(-1, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, name="norm", **kw)(h)


class ImageProjectionPlus(nn.Module):
    clip_hidden_dim: int = 1024
    cross_attention_dim: int = 768
    num_tokens: int = 16
    num_heads: int = 8
    depth: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        """(B, num_patches+1, clip_hidden_dim) → (B, N, D)."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        D = self.cross_attention_dim
        B = hidden_states.shape[0]

        h = hidden_states
        if self.clip_hidden_dim != D:
            h = nn.Dense(D, name="proj_in", **kw)(h)

        latents = self.param(
            "latents", nn.initializers.normal(0.02), (1, self.num_tokens, D)
        )
        latents = jnp.broadcast_to(latents, (B, self.num_tokens, D)).astype(h.dtype)

        for d in range(self.depth):
            residual = latents
            normed = nn.LayerNorm(epsilon=1e-5, name=f"layers_{d}_norm1", **kw)(latents)
            attended = MultiheadAttention(
                D, self.num_heads, name=f"layers_{d}_cross_attn",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(normed, h, h)
            latents = residual + attended

            residual = latents
            normed = nn.LayerNorm(epsilon=1e-5, name=f"layers_{d}_norm2", **kw)(latents)
            ff = nn.Dense(D * 4, name=f"layers_{d}_ff_0", **kw)(normed)
            ff = gelu(ff)
            ff = nn.Dense(D, name=f"layers_{d}_ff_2", **kw)(ff)
            latents = residual + ff

        return nn.LayerNorm(epsilon=1e-5, name="norm_out", **kw)(latents)
