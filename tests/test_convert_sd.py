"""SD weight-converter tests: a synthetic diffusers-format state dict (exact
torch key names/shapes for the SD v1.4 UNet and VAE) must convert to a tree
that matches our models' init shapes leaf-for-leaf, and a forward pass with
ported weights must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.convert.sd import (
    convert_sd_unet,
    convert_sd_vae,
    verify_params_match,
)
from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config
from psd_tpu.models.vae import AutoencoderKL, sd_vae_config


def _shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def _synth_unet_torch_sd():
    """Enumerate the diffusers UNet2DConditionModel key set for SD v1.4."""
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def resnet(name, cin, cout, temb=1280):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout, 3)
        lin(f"{name}.time_emb_proj", temb, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, 1)

    def attn_block(name, c, ctx=768):
        norm(f"{name}.norm", c)
        conv(f"{name}.proj_in", c, c, 1)
        t = f"{name}.transformer_blocks.0"
        for ln in ("norm1", "norm2", "norm3"):
            norm(f"{t}.{ln}", c)
        for a, kdim in (("attn1", c), ("attn2", ctx)):
            lin(f"{t}.{a}.to_q", c, c, bias=False)
            lin(f"{t}.{a}.to_k", kdim, c, bias=False)
            lin(f"{t}.{a}.to_v", kdim, c, bias=False)
            lin(f"{t}.{a}.to_out.0", c, c)
        lin(f"{t}.ff.net.0.proj", c, c * 8)
        lin(f"{t}.ff.net.2", c * 4, c)
        conv(f"{name}.proj_out", c, c, 1)

    chans = (320, 640, 1280, 1280)
    conv("conv_in", 4, 320, 3)
    lin("time_embedding.linear_1", 320, 1280)
    lin("time_embedding.linear_2", 1280, 1280)

    cin = 320
    for i, c in enumerate(chans):
        has_attn = i < 3
        for j in range(2):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
            if has_attn:
                attn_block(f"down_blocks.{i}.attentions.{j}", c)
        if i < 3:
            conv(f"down_blocks.{i}.downsamplers.0.conv", c, c, 3)
        cin = c

    resnet("mid_block.resnets.0", 1280, 1280)
    attn_block("mid_block.attentions.0", 1280)
    resnet("mid_block.resnets.1", 1280, 1280)

    rev = tuple(reversed(chans))  # (1280,1280,640,320)
    skip_chs = []  # skip channel stack mirrors the down path
    skip_chs.append(320)
    for i, c in enumerate(chans):
        skip_chs += [c, c]
        if i < 3:
            skip_chs.append(c)
    prev = 1280
    for i, c in enumerate(rev):
        has_attn = i > 0
        for j in range(3):
            skip = skip_chs.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", prev + skip, c)
            prev = c
            if has_attn:
                attn_block(f"up_blocks.{i}.attentions.{j}", c)
        if i < 3:
            conv(f"up_blocks.{i}.upsamplers.0.conv", c, c, 3)

    norm("conv_norm_out", 320)
    conv("conv_out", 320, 4, 3)
    return sd


@pytest.mark.slow
def test_unet_conversion_complete_and_runs():
    sd = _synth_unet_torch_sd()
    # plain mode: converted tree must match init shapes exactly
    model = UNet2DCondition(sd14_unet_config(attn_mode="plain", dtype=jnp.float32))
    init_shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                             jnp.zeros((1, 48, 768))),
        jax.random.PRNGKey(0),
    )
    converted = convert_sd_unet(sd, warm_start_kv_dis=False)
    verify_params_match(converted["params"], init_shapes["params"])

    # split3 mode with warm-started to_k_dis/to_v_dis
    model3 = UNet2DCondition(sd14_unet_config(attn_mode="split3", dtype=jnp.float32))
    init3 = jax.eval_shape(
        lambda k: model3.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                              jnp.zeros((1, 48, 768)), 0.0),
        jax.random.PRNGKey(0),
    )
    conv3 = convert_sd_unet(sd, warm_start_kv_dis=True)
    verify_params_match(conv3["params"], init3["params"])
    # warm start equals pretrained text K/V
    blk = conv3["params"]["mid_block_attentions_0"]["transformer_blocks_0"]
    np.testing.assert_array_equal(
        blk["attn2"]["to_k_dis"]["kernel"], blk["attn2"]["to_k"]["kernel"]
    )


def _synth_vae_torch_sd():
    rng = np.random.default_rng(1)
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout, 3)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, 1)

    def mid(prefix, c):
        resnet(f"{prefix}.resnets.0", c, c)
        norm(f"{prefix}.attentions.0.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{prefix}.attentions.0.{n}", c, c)
        resnet(f"{prefix}.resnets.1", c, c)

    chans = (128, 256, 512, 512)
    conv("encoder.conv_in", 3, 128, 3)
    cin = 128
    for i, c in enumerate(chans):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c, 3)
        cin = c
    mid("encoder.mid_block", 512)
    norm("encoder.conv_norm_out", 512)
    conv("encoder.conv_out", 512, 8, 3)

    conv("decoder.conv_in", 4, 512, 3)
    mid("decoder.mid_block", 512)
    rev = (512, 512, 256, 128)
    prev = 512
    for i, c in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
            prev = c
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c, 3)
    norm("decoder.conv_norm_out", 128)
    conv("decoder.conv_out", 128, 3, 3)
    conv("quant_conv", 8, 8, 1)
    conv("post_quant_conv", 4, 4, 1)
    return sd


def test_vae_conversion_complete():
    sd = _synth_vae_torch_sd()
    vae = AutoencoderKL(sd_vae_config(dtype=jnp.float32))
    init_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0),
    )
    converted = convert_sd_vae(sd)
    verify_params_match(converted["params"], init_shapes["params"])
