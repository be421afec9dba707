"""SD-v1.4-class conditional UNet, built TPU-first in flax.linen.

Capability match to the reference's `OrdinalUNet` wrapper around diffusers'
`UNet2DConditionModel` (src/models/unet/unet.py:21-146) plus the attention-
processor machinery (attention_processor_base.py, attention_processor_
routing_gates.py) — but the routing behavior is STATIC model configuration
(CrossAttnMode per block role) rather than runtime processor replacement,
and `delta_scale` is a traced scalar call argument rather than mutated
module state (the reference mutates it at inference_pipeline_ip.py:311-318).

Block-role assignment reproduces get_block_type
(attention_processor_routing_gates.py:199-230): low-resolution blocks
(down index ≥ n−2, mid, up index ≤ 1) carry the "disease" role; high-res
blocks carry "anatomy".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import GroupNorm
from .layers import (
    CrossAttnMode,
    Downsample2D,
    FinalConv,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 768
    transformer_depth: int = 1
    # conditioning routing: "plain" | "split2" | "split3"
    attn_mode: str = "plain"
    num_aoe_tokens: int = 16
    num_image_tokens: int = 16
    num_delta_tokens: int = 16
    use_frequency_strategy: bool = True
    # (anat_gate, dis_gate) per block role — configs/train_ip.yaml:31-32
    gate_init_anatomy: Tuple[float, float] = (0.5, 0.5)
    gate_init_disease: Tuple[float, float] = (0.5, 0.5)
    gate_init_both: Tuple[float, float] = (0.5, 0.5)
    # "int8": W8A8 MXU inference path (big matmuls + ≤32² convs; quality-
    # gated, see ops/quant.py). Inference-only — keep "none" for training.
    quant: str = "none"
    # ToMe token merging (regional variant of arXiv:2303.17098) — quality-
    # gated turbo lever, inference-only, applied at sites with >=
    # tome_min_tokens (stage 0). Ratio quantizes to m/4 (0.25/0.5/0.75 =
    # merge m of the 3 src tokens per 2x2 region); 0.0 = off (exact path;
    # the default). See ops/tome.py.
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    tome_mlp: bool = False
    tome_cross: bool = False
    # "branch" (ToMe-SD per-branch) | "block" (block-resident: one merge/
    # unmerge per transformer block, everything inside at merged length)
    tome_mode: str = "branch"
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def block_role(self, where: str, idx: int = 0) -> str:
        """anatomy/disease role per block (get_block_type semantics)."""
        if not self.use_frequency_strategy:
            return "both"
        n = len(self.block_out_channels)
        if where == "mid":
            return "disease"
        if where == "down":
            return "disease" if idx >= n - 2 else "anatomy"
        if where == "up":
            return "disease" if idx <= 1 else "anatomy"
        return "both"

    @property
    def tome_spec(self):
        from ..ops.tome import ToMeSpec

        return ToMeSpec(
            ratio=self.tome_ratio,
            min_tokens=self.tome_min_tokens,
            merge_mlp=self.tome_mlp,
            merge_cross=self.tome_cross,
            mode=self.tome_mode,
        )

    def attn_mode_for(self, where: str, idx: int = 0) -> CrossAttnMode:
        role = self.block_role(where, idx)
        gates = {
            "anatomy": self.gate_init_anatomy,
            "disease": self.gate_init_disease,
            "both": self.gate_init_both,
        }[role]
        if self.attn_mode == "split2":
            # reference's frequency-mode scales ship neutralized at 1.0
            # (attention_processor_base.py:29-37)
            return CrossAttnMode(
                kind="split2",
                num_aoe_tokens=self.num_aoe_tokens,
                num_image_tokens=self.num_image_tokens,
            )
        if self.attn_mode == "split3":
            return CrossAttnMode(
                kind="split3",
                num_aoe_tokens=self.num_aoe_tokens,
                num_image_tokens=self.num_image_tokens,
                num_delta_tokens=self.num_delta_tokens,
                anat_gate=gates[0],
                dis_gate=gates[1],
            )
        return CrossAttnMode(kind="plain")

    @property
    def has_cross_attn(self) -> Tuple[bool, ...]:
        """Down-block attention flags: all but the last block (SD1.x layout)."""
        n = len(self.block_out_channels)
        return tuple(i < n - 1 for i in range(n))


class UNet2DCondition(nn.Module):
    """SD-class conditional UNet.

    `phase` splits the forward for encoder-propagation sampling (Faster
    Diffusion, arXiv:2312.09608 — down+mid features change little between
    adjacent timesteps, so cached ("propagated") encoder features can feed
    decoder-only steps):
      "full"   — ordinary forward → eps.
      "encode" — down+mid only → (h_mid, skips tuple).
      "decode" — up+out from `cached` (h_mid, skips) with a FRESH timestep
                 embedding → eps. Never touches `sample`.

    A second split implements DeepCache-style branch caching (arXiv:
    2310.01407 — the deep feature entering the LAST up block drifts slowly
    across adjacent timesteps, while the shallow path tracks x_t):
      "deep"    — full forward that ALSO returns that deep feature:
                  → (eps, deep).
      "shallow" — conv_in → down block 0 → last up block from `cached`
                  (the deep feature) → out. Runs the CURRENT x_t through
                  the shallow path every step (unlike "decode", which
                  never sees x_t) → eps.
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C_in) NHWC latents
        timesteps: jnp.ndarray,  # (B,) int or float
        encoder_hidden_states: jnp.ndarray,  # (B, N, cross_attention_dim)
        delta_scale: Optional[jnp.ndarray] = None,  # traced scalar, split3 only
        phase: str = "full",
        cached=None,  # (h_mid, skips) for phase="decode"
    ):
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        ResBlock = ResnetBlock2D
        AttnBlock = Transformer2D
        if cfg.remat:
            ResBlock = nn.remat(ResnetBlock2D)
            AttnBlock = nn.remat(Transformer2D, static_argnums=())

        # --- time embedding ---
        t_emb = timestep_embedding(timesteps, ch0)
        temb = TimestepEmbedding(time_embed_dim, name="time_embedding", **kw)(
            t_emb.astype(cfg.dtype)
        )

        ctx = encoder_hidden_states.astype(cfg.dtype)
        tome = cfg.tome_spec if cfg.tome_ratio > 0.0 else None
        n_blocks = len(cfg.block_out_channels)
        if phase == "decode":
            assert cached is not None
            h, skips_in = cached
            h = h.astype(cfg.dtype)
            skips = [s.astype(cfg.dtype) for s in skips_in]
        else:
            h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in", **kw)(
                sample.astype(cfg.dtype)
            )

            # --- down path ---
            # "shallow" (DeepCache, arXiv:2310.01407): only down block 0 —
            # its skips feed the last up block; the downsampler output is
            # consumed deeper and is not needed
            down_range = (0,) if phase == "shallow" else range(n_blocks)
            skips = [h]
            for i in down_range:
                out_ch = cfg.block_out_channels[i]
                has_attn = cfg.has_cross_attn[i]
                mode = cfg.attn_mode_for("down", i)
                for j in range(cfg.layers_per_block):
                    h = ResBlock(
                        out_ch, name=f"down_blocks_{i}_resnets_{j}",
                        quant=cfg.quant, **kw
                    )(h, temb)
                    if has_attn:
                        h = AttnBlock(
                            cfg.num_heads,
                            depth=cfg.transformer_depth,
                            mode=mode,
                            quant=cfg.quant,
                            tome=tome,
                            name=f"down_blocks_{i}_attentions_{j}",
                            **kw,
                        )(h, ctx, delta_scale)
                    skips.append(h)
                if i < n_blocks - 1 and phase != "shallow":
                    h = Downsample2D(out_ch, name=f"down_blocks_{i}_downsamplers_0", **kw)(h)
                    skips.append(h)

            if phase != "shallow":
                # --- mid ---
                mid_ch = cfg.block_out_channels[-1]
                h = ResBlock(mid_ch, name="mid_block_resnets_0", quant=cfg.quant,
                             **kw)(h, temb)
                h = AttnBlock(
                    cfg.num_heads,
                    depth=cfg.transformer_depth,
                    mode=cfg.attn_mode_for("mid"),
                    quant=cfg.quant,
                    tome=tome,
                    name="mid_block_attentions_0",
                    **kw,
                )(h, ctx, delta_scale)
                h = ResBlock(mid_ch, name="mid_block_resnets_1", quant=cfg.quant,
                             **kw)(h, temb)
                if phase == "encode":
                    return h, tuple(skips)

        # --- up path ---
        rev_channels = tuple(reversed(cfg.block_out_channels))
        rev_attn = tuple(reversed(cfg.has_cross_attn))
        deep_out = None
        if phase == "shallow":
            assert cached is not None
            up_range = (n_blocks - 1,)
            h = cached.astype(cfg.dtype)
        else:
            up_range = range(n_blocks)
        for i in up_range:
            out_ch = rev_channels[i]
            has_attn = rev_attn[i]
            mode = cfg.attn_mode_for("up", i)
            if phase == "deep" and i == n_blocks - 1:
                # input to the LAST up block — the DeepCache branch feature
                deep_out = h
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                # the skip join is a VIRTUAL concat: ResnetBlock2D computes
                # GN stats over both parts and splits conv1/shortcut weights
                # so concat([h, skip]) is never materialized (layers.py)
                h = ResBlock(out_ch, name=f"up_blocks_{i}_resnets_{j}",
                             quant=cfg.quant, **kw)(h, temb, skip)
                if has_attn:
                    h = AttnBlock(
                        cfg.num_heads,
                        depth=cfg.transformer_depth,
                        mode=mode,
                        quant=cfg.quant,
                        tome=tome,
                        name=f"up_blocks_{i}_attentions_{j}",
                        **kw,
                    )(h, ctx, delta_scale)
            if i < n_blocks - 1:
                h = Upsample2D(out_ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(h)

        # --- out ---
        h = GroupNorm(num_groups=32, epsilon=1e-5, name="conv_norm_out", **kw)(h)
        h = nn.silu(h)
        # compute-dtype operands, fp32 accumulation/output: the 4-channel
        # output pads to 128 MXU lanes either way; fp32 operands would only
        # quarter the rate (FinalConv docstring)
        h = FinalConv(cfg.out_channels, name="conv_out",
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        if phase == "deep":
            return h, deep_out
        return h


def sd14_unet_config(**overrides) -> UNetConfig:
    """The SD v1.4 UNet the reference fine-tunes (unet.py:70-75)."""
    return UNetConfig(**overrides)


def tiny_unet_config(**overrides) -> UNetConfig:
    """Small config for fast CPU tests (SURVEY.md §4c fake backend)."""
    base = dict(
        block_out_channels=(32, 64),
        layers_per_block=1,
        num_heads=2,
        cross_attention_dim=32,
        dtype=jnp.float32,
    )
    base.update(overrides)
    return UNetConfig(**base)
