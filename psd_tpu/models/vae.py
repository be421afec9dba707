"""AutoencoderKL (SD VAE) in flax.linen, NHWC.

Capability match to the reference's frozen `SDVAE` wrapper
(src/models/vae/vae.py:32-112): encode images in [-1,1] to a diagonal
Gaussian over 4-channel latents, decode back; the 0.18215 latent scaling is
applied by callers (diffusion module), exactly as in the reference.

Architecture mirrors diffusers' AutoencoderKL for SD v1.x:
block_out_channels (128,256,512,512), 2 layers/block, mid attention with a
single head over spatial tokens, quant/post-quant 1x1 convs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import GroupNorm
from .layers import FinalConv, ResnetBlock2D, Upsample2D


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    # fp32 OPERANDS for the final encoder/decoder 3×3 convs (legacy/A-B
    # knob). Off by default: their 3/8-channel outputs pad to 128 lanes
    # either way, and fp32 operands quarter the MXU rate; accumulation is
    # fp32 regardless (FinalConv), and the inputs are already bf16-rounded
    # upstream, so operand precision costs pixels nothing measurable.
    final_conv_fp32: bool = False
    # "int8": W8A8 MXU path for the DECODER resblock convs, gated to the
    # measured win-region (layers.ResnetBlock2D quant_gate="vae" — 1.3-1.9×
    # per conv at the 512-/256-/128-channel decoder shapes,
    # scripts/probe_int8.py --vae). Inference-only, default off; param tree
    # unchanged (weights quantize inline). Quality-gated like every turbo
    # lever: scripts/check_int8_quality.py --vae measures decode PSNR.
    quant: str = "none"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, H, W, C = x.shape
        h = GroupNorm(num_groups=self.groups, epsilon=1e-6, name="group_norm", **kw)(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q", **kw)(h)
        k = nn.Dense(C, name="to_k", **kw)(h)
        v = nn.Dense(C, name="to_v", **kw)(h)
        # single "head" of width C; fused flash path on TPU at 4096 tokens
        from ..ops.attention import dot_product_attention

        z = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        z = nn.Dense(C, name="to_out_0", **kw)(z)
        return x + z.reshape(B, H, W, C)


class VAEMidBlock(nn.Module):
    channels: int
    quant: str = "none"  # decoder-side only (encode feeds training latents)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ResnetBlock2D(self.channels, use_temb=False, eps=1e-6,
                          quant=self.quant, quant_gate="vae",
                          name="resnets_0", **kw)(h)
        h = VAEAttention(name="attentions_0", **kw)(h)
        h = ResnetBlock2D(self.channels, use_temb=False, eps=1e-6,
                          quant=self.quant, quant_gate="vae",
                          name="resnets_1", **kw)(h)
        return h


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            x.astype(cfg.dtype)
        )
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, use_temb=False, eps=1e-6,
                                  name=f"down_blocks_{i}_resnets_{j}", **kw)(h)
            if i < n - 1:
                # diffusers VAE downsample uses asymmetric (0,1) padding
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            name=f"down_blocks_{i}_downsamplers_0", **kw)(h)
        h = VAEMidBlock(cfg.block_out_channels[-1], name="mid_block",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        h = GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="conv_norm_out", **kw)(h)
        h = nn.silu(h)
        return FinalConv(
            2 * cfg.latent_channels, name="conv_out",
            dtype=jnp.float32 if cfg.final_conv_fp32 else cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in", **kw)(z.astype(cfg.dtype))
        h = VAEMidBlock(rev[0], name="mid_block", quant=cfg.quant,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, use_temb=False, eps=1e-6,
                                  quant=cfg.quant, quant_gate="vae",
                                  name=f"up_blocks_{i}_resnets_{j}", **kw)(h)
            if i < n - 1:
                h = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(h)
        h = GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6,
                         name="conv_norm_out", **kw)(h)
        h = nn.silu(h)
        return FinalConv(
            cfg.out_channels, name="conv_out",
            dtype=jnp.float32 if cfg.final_conv_fp32 else cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(h)


class AutoencoderKL(nn.Module):
    """encode → DiagonalGaussian params; decode; sample via external key."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        cfg = self.config
        kw = dict(dtype=jnp.float32, param_dtype=cfg.param_dtype)
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1), name="quant_conv", **kw)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1),
                                       name="post_quant_conv", **kw)

    def encode(self, x):
        """x: (B,H,W,3) in [-1,1] → (mean, logvar) each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z):
        """z: (B,H/8,W/8,4) unscaled latents → (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        mean, logvar = self.encode(x)
        z = sample_gaussian(mean, logvar, key)
        return self.decode(z), mean, logvar


def sample_gaussian(mean, logvar, key):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def sd_vae_config(**overrides) -> VAEConfig:
    return VAEConfig(**overrides)


def tiny_vae_config(**overrides) -> VAEConfig:
    base = dict(block_out_channels=(32, 64), layers_per_block=1, dtype=jnp.float32)
    base.update(overrides)
    return VAEConfig(**base)
