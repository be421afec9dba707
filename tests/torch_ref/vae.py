"""Torch mirror of diffusers `AutoencoderKL` (SD v1.x VAE).

state_dict keys match the CompVis/stable-diffusion-v1-4 `vae` checkpoint
(encoder.down_blocks.N.resnets.M..., mid_block.attentions.0.group_norm/
to_q/to_k/to_v/to_out.0, quant_conv, post_quant_conv, ...). The reference
loads this architecture via diffusers at
/root/reference/src/models/vae/vae.py:60-65.

Spec points mirrored exactly: GN eps 1e-6 everywhere, single-head spatial
attention in both mid blocks, asymmetric (0,1,0,1) pad on encoder
downsampling, nearest-x2 upsample in the decoder.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from .unet import ResnetBlock2D  # eps parameterized; VAE passes 1e-6


class VAEAttention(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x)
        h = h.view(B, C, H * W).transpose(1, 2)  # (B, HW, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        z = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
        ).squeeze(1)
        z = self.to_out[0](z)
        return x + z.transpose(1, 2).view(B, C, H, W)


class VAEMidBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, eps=1e-6), ResnetBlock2D(ch, ch, eps=1e-6)]
        )
        self.attentions = nn.ModuleList([VAEAttention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class DownEncoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, eps=1e-6)
             for j in range(layers)]
        )
        self.downsamplers = None
        if add_down:
            ds = nn.Module()
            ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))  # diffusers asymmetric pad
            x = self.downsamplers[0].conv(x)
        return x


class UpDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, eps=1e-6)
             for j in range(layers)]
        )
        self.upsamplers = None
        if add_up:
            up = nn.Module()
            up.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsamplers = nn.ModuleList([up])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class Encoder(nn.Module):
    def __init__(self, in_ch, latent_ch, block_out_channels, layers):
        super().__init__()
        self.conv_in = nn.Conv2d(in_ch, block_out_channels[0], 3, padding=1)
        n = len(block_out_channels)
        self.down_blocks = nn.ModuleList()
        prev = block_out_channels[0]
        for i, ch in enumerate(block_out_channels):
            self.down_blocks.append(
                DownEncoderBlock(prev, ch, layers, add_down=i < n - 1)
            )
            prev = ch
        self.mid_block = VAEMidBlock(prev)
        self.conv_norm_out = nn.GroupNorm(32, prev, eps=1e-6)
        self.conv_out = nn.Conv2d(prev, 2 * latent_ch, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class Decoder(nn.Module):
    def __init__(self, out_ch, latent_ch, block_out_channels, layers):
        super().__init__()
        rev = tuple(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(latent_ch, rev[0], 3, padding=1)
        self.mid_block = VAEMidBlock(rev[0])
        n = len(rev)
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            self.up_blocks.append(
                UpDecoderBlock(prev, ch, layers + 1, add_up=i < n - 1)
            )
            prev = ch
        self.conv_norm_out = nn.GroupNorm(32, prev, eps=1e-6)
        self.conv_out = nn.Conv2d(prev, out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            h = blk(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchAutoencoderKL(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        self.encoder = Encoder(in_channels, latent_channels,
                               block_out_channels, layers_per_block)
        self.decoder = Decoder(out_channels, latent_channels,
                               block_out_channels, layers_per_block)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        """x: (B,3,H,W) in [-1,1] -> (mean, logvar) each (B,4,H/8,W/8)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
