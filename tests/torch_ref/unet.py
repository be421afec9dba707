"""Torch mirror of diffusers `UNet2DConditionModel` (SD v1.x layout).

state_dict keys match the CompVis/stable-diffusion-v1-4 `unet` checkpoint
exactly (down_blocks.N.resnets.M.norm1.weight, ...attn2.to_out.0.weight,
ff.net.0.proj.weight, etc.), so `psd_tpu.convert.sd.convert_sd_unet` can
ingest `model.state_dict()` unmodified.

Reference provenance: the PyTorch reference loads this architecture via
diffusers at /root/reference/src/models/unet/unet.py:70-75; the math below
follows the SD v1.x spec (GN eps 1e-5 resnets / 1e-6 transformer norm,
8 attention heads at every resolution, GEGLU feed-forward, exact GELU).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_timestep_embedding(timesteps, dim, max_period=10000.0):
    """SD convention: flip_sin_to_cos=True, downscale_freq_shift=0."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    # sin|cos, then flip -> cos|sin
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, eps=1e-5, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        shortcut = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return shortcut + h


class Attention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v (no bias), to_out.0 (bias).

    Optionally carries split-injection extras (to_k_dis/to_v_dis) mirroring
    the reference's SplitInjectionAttentionProcessor
    (/root/reference/src/models/attention_processor_routing_gates.py:77-196).
    """

    def __init__(self, dim, heads, ctx_dim=None, split3=False):
        super().__init__()
        self.heads = heads
        kv_dim = ctx_dim if ctx_dim is not None else dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.split3 = split3
        if split3:
            self.to_k_dis = nn.Linear(kv_dim, dim, bias=False)
            self.to_v_dis = nn.Linear(kv_dim, dim, bias=False)

    def _attn(self, q_in, k_src, v_src, to_k, to_v):
        B, S, D = q_in.shape
        h = self.heads
        q = q_in.view(B, S, h, D // h).transpose(1, 2)
        k = to_k(k_src).view(B, -1, h, D // h).transpose(1, 2)
        v = to_v(v_src).view(B, -1, h, D // h).transpose(1, 2)
        z = F.scaled_dot_product_attention(q, k, v)
        return z.transpose(1, 2).reshape(B, S, D)

    def forward(self, x, ctx=None, gates=None, delta_scale=0.0,
                n_aoe=16, n_img=16, n_delta=16):
        ctx_full = x if ctx is None else ctx
        q_in = self.to_q(x)
        if self.split3 and ctx is not None:
            # [dis | anat | ... | delta] segment routing
            dis_tok = ctx_full[:, :n_aoe]
            anat_tok = ctx_full[:, n_aoe : n_aoe + n_img]
            delta_tok = ctx_full[:, ctx_full.shape[1] - n_delta :]
            z_anat = self._attn(q_in, anat_tok, anat_tok, self.to_k, self.to_v)
            z_dis = self._attn(q_in, dis_tok, dis_tok, self.to_k_dis, self.to_v_dis)
            z_delta = self._attn(q_in, delta_tok, delta_tok, self.to_k_dis, self.to_v_dis)
            anat_gate, dis_gate = gates if gates is not None else (0.5, 0.5)
            z = anat_gate * z_anat + dis_gate * z_dis + delta_scale * z_delta
        else:
            z = self._attn(q_in, ctx_full, ctx_full, self.to_k, self.to_v)
        return self.to_out[0](z)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim, split3=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, ctx_dim=ctx_dim, split3=split3)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx, gates=None, delta_scale=0.0, split_tokens=(16, 16, 16)):
        x = x + self.attn1(self.norm1(x))
        n_aoe, n_img, n_delta = split_tokens
        x = x + self.attn2(self.norm2(x), ctx, gates=gates,
                           delta_scale=delta_scale,
                           n_aoe=n_aoe, n_img=n_img, n_delta=n_delta)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, dim, heads, ctx_dim, depth=1, groups=32, split3=False):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, heads, ctx_dim, split3=split3)
             for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx, **kw):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for blk in self.transformer_blocks:
            h = blk(h, ctx, **kw)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class Downsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlock(nn.Module):
    """CrossAttnDownBlock2D (has_attn) / DownBlock2D."""

    def __init__(self, in_ch, out_ch, temb_dim, heads, ctx_dim, layers,
                 has_attn, add_down, split3=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_dim)
             for j in range(layers)]
        )
        if has_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, ctx_dim, split3=split3)
                 for _ in range(layers)]
            )
        else:
            self.attentions = None
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_ch)]) if add_down else None
        )

    def forward(self, x, temb, ctx, **kw):
        outs = []
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx, **kw)
            outs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs.append(x)
        return x, outs


class MidBlock(nn.Module):
    def __init__(self, ch, temb_dim, heads, ctx_dim, split3=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_dim), ResnetBlock2D(ch, ch, temb_dim)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, heads, ctx_dim, split3=split3)]
        )

    def forward(self, x, temb, ctx, **kw):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx, **kw)
        return self.resnets[1](x, temb)


class UpBlock(nn.Module):
    """CrossAttnUpBlock2D (has_attn) / UpBlock2D; skip-concat per resnet."""

    def __init__(self, res_in_chs, out_ch, temb_dim, heads, ctx_dim,
                 has_attn, add_up, split3=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ic, out_ch, temb_dim) for ic in res_in_chs]
        )
        if has_attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, heads, ctx_dim, split3=split3)
                 for _ in res_in_chs]
            )
        else:
            self.attentions = None
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if add_up else None

    def forward(self, x, skips, temb, ctx, **kw):
        for j, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx, **kw)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TorchUNet2DConditionModel(nn.Module):
    def __init__(
        self,
        in_channels=4,
        out_channels=4,
        block_out_channels=(320, 640, 1280, 1280),
        layers_per_block=2,
        heads=8,
        cross_attention_dim=768,
        split3=False,
    ):
        super().__init__()
        self.split3 = split3
        ch0 = block_out_channels[0]
        temb_dim = ch0 * 4
        n = len(block_out_channels)
        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim)

        # SD layout: cross-attn on every down block except the last;
        # downsampler on every down block except the last.
        skip_chs = [ch0]
        self.down_blocks = nn.ModuleList()
        prev = ch0
        for i, out_ch in enumerate(block_out_channels):
            has_attn = i < n - 1
            add_down = i < n - 1
            self.down_blocks.append(
                DownBlock(prev, out_ch, temb_dim, heads, cross_attention_dim,
                          layers_per_block, has_attn, add_down, split3=split3)
            )
            skip_chs += [out_ch] * layers_per_block
            if add_down:
                skip_chs.append(out_ch)
            prev = out_ch

        self.mid_block = MidBlock(prev, temb_dim, heads, cross_attention_dim,
                                  split3=split3)

        rev = tuple(reversed(block_out_channels))
        self.up_blocks = nn.ModuleList()
        for i, out_ch in enumerate(rev):
            has_attn = i > 0  # reversed(has_cross_attn)
            add_up = i < n - 1
            res_in = []
            for _ in range(layers_per_block + 1):
                res_in.append(prev + skip_chs.pop())
                prev = out_ch
            self.up_blocks.append(
                UpBlock(res_in, out_ch, temb_dim, heads, cross_attention_dim,
                        has_attn, add_up, split3=split3)
            )

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, out_channels, 3, padding=1)
        self._ch0 = ch0

    def forward(self, sample, timesteps, encoder_hidden_states,
                gates_by_role=None, delta_scale=0.0, split_tokens=(16, 16, 16),
                use_frequency_strategy=True):
        """sample: (B, C, H, W) NCHW; encoder_hidden_states: (B, N, D).

        gates_by_role: {"anatomy": (a, d), "disease": (a, d), "both": (a, d)}
        for split3 routing (UNetConfig.block_role semantics).
        """
        n = len(self.down_blocks)

        def role(where, idx=0):
            if not use_frequency_strategy:
                return "both"
            if where == "mid":
                return "disease"
            if where == "down":
                return "disease" if idx >= n - 2 else "anatomy"
            return "disease" if idx <= 1 else "anatomy"

        def kw_for(where, idx=0):
            if not self.split3:
                return {}
            g = (gates_by_role or {}).get(role(where, idx), (0.5, 0.5))
            return dict(gates=g, delta_scale=delta_scale,
                        split_tokens=split_tokens)

        temb = self.time_embedding(
            get_timestep_embedding(timesteps, self._ch0)
        )
        h = self.conv_in(sample)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            h, outs = blk(h, temb, encoder_hidden_states, **kw_for("down", i))
            skips.extend(outs)
        h = self.mid_block(h, temb, encoder_hidden_states, **kw_for("mid"))
        for i, blk in enumerate(self.up_blocks):
            h = blk(h, skips, temb, encoder_hidden_states, **kw_for("up", i))
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        return h
