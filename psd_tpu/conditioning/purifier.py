"""Feature Purifier — embedding-level disease erasure for IP tokens.

Semantics match src/models/feature_purifier.py:64-95:
  1. LN(image tokens), LN(source-AOE tokens)
  2. cross-attention: normalized image queries attend to normalized AOE
     keys/values → disease component
  3. sigmoid gate MLP over concat(disease, normed image): 2D→D·ff_mult→D
  4. e_clean = image_embeds − gate ⊙ disease   (raw image, normed gate input)
  5. LayerNorm out

The attention is a standard torch-MultiheadAttention-equivalent (packed
QKV with bias, output projection with bias).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..models.layers import gelu
from ..ops.attention import dot_product_attention


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch_first, bias=True)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        D, H = self.dim, self.num_heads
        hd = D // H
        B, Sq, _ = query.shape
        q = nn.Dense(D, name="q_proj", **kw)(query).reshape(B, Sq, H, hd)
        k = nn.Dense(D, name="k_proj", **kw)(key).reshape(B, -1, H, hd)
        v = nn.Dense(D, name="v_proj", **kw)(value).reshape(B, -1, H, hd)
        z = dot_product_attention(q, k, v).reshape(B, Sq, D)
        return nn.Dense(D, name="out_proj", **kw)(z)


class FeaturePurifier(nn.Module):
    dim: int = 768
    num_heads: int = 8
    ff_mult: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray, source_aoe: jnp.ndarray):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        img_n = nn.LayerNorm(epsilon=1e-5, name="norm_img", **kw)(image_embeds)
        aoe_n = nn.LayerNorm(epsilon=1e-5, name="norm_aoe", **kw)(source_aoe)

        disease = MultiheadAttention(
            self.dim, self.num_heads, name="cross_attn",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(img_n, aoe_n, aoe_n)

        gate_in = jnp.concatenate([disease, img_n], axis=-1)
        g = nn.Dense(self.dim * self.ff_mult, name="gate_0", **kw)(gate_in)
        g = gelu(g)
        g = nn.Dense(self.dim, name="gate_2", **kw)(g)
        gate = nn.sigmoid(g)

        e_clean = image_embeds - gate * disease
        return nn.LayerNorm(epsilon=1e-5, name="norm_out", **kw)(e_clean)
