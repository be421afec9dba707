"""Tiny full-stack model factories for tests, smoke runs, and the
multi-chip dry-run (CPU-fast shapes, full DADD architecture)."""

from __future__ import annotations

import jax.numpy as jnp

from .core.config import Config
from .diffusion.dadd import DADD, DADDCoreConfig
from .models.clip import tiny_clip_config
from .models.unet import tiny_unet_config
from .models.vae import tiny_vae_config


def tiny_dadd(routing=True, purifier=True, plus=True, image_cond=True,
              **unet_overrides) -> DADD:
    cfg = Config()
    cfg.dataset.image_size = 32
    cfg.diffusion.sampling_steps = 4
    cfg.model.use_routing_gates = routing
    if not image_cond:
        # base (non-IP) module: plain cross-attention, no processors
        attn_mode = "plain"
    else:
        attn_mode = "split3" if routing else "split2"
    core_cfg = DADDCoreConfig(
        unet=tiny_unet_config(
            attn_mode=attn_mode,
            num_aoe_tokens=4,
            num_image_tokens=4,
            num_delta_tokens=4,
            **unet_overrides,
        ),
        embedding_dim=32,
        conditioning_dim=32,
        num_classes=4,
        num_aoe_tokens=4,
        num_image_tokens=4,
        use_image_projection_plus=plus,
        use_feature_purifier=purifier,
        use_routing_gates=routing,
        purifier_num_heads=2,
        clip_hidden_dim=32,
        clip_projection_dim=16,
        use_image_conditioning=image_cond,
    )
    return DADD(
        cfg,
        core_cfg=core_cfg,
        vae_cfg=tiny_vae_config(),
        clip_cfg=tiny_clip_config(),
        dtype=jnp.float32,
    )
