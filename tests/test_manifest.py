"""Manifest pinning tests (public-ground-truth anchor for the parity chain).

The golden parity tests (test_golden_*.py) chain through self-authored torch
mirrors — a shared mirror/converter misunderstanding of the architecture
could pass silently. psd_tpu/convert/manifest.py enumerates, from the
published model configurations alone, the EXACT state-dict surface of the
checkpoints the reference loads (SD v1.4 unet/vae at
src/models/unet/unet.py:70-75 and src/models/vae/vae.py:60-65; CLIP
ViT-L/14 at configs/train_ip.yaml:19). These tests assert that

  (a) the torch mirrors produce exactly that surface (every key, every
      shape — none missing, none invented),
  (b) the torch→flax converters consume every manifest key and produce
      exactly the flax models' init trees, and
  (c) for CLIP, the manifest itself matches the INSTALLED HuggingFace
      transformers implementation — independent public ground truth.

scripts/port_weights.py --verify applies the same checks to real
checkpoint files the day they are available.
"""

import numpy as np
import pytest
import torch

from psd_tpu.convert.manifest import (
    assert_matches,
    clip_vision_manifest,
    diff_manifest,
    sd_unet_manifest,
    sd_vae_manifest,
)


def _param_surface(model: torch.nn.Module):
    """{name: shape} over parameters (the weights-only checkpoint surface)."""
    return {k: tuple(v.shape) for k, v in model.named_parameters()}


def _meta(ctor, *args, **kwargs):
    """Construct a torch module on the meta device (shapes only, no alloc)."""
    with torch.device("meta"):
        return ctor(*args, **kwargs)


# ---------------------------------------------------------------------------
# (a) torch mirrors == manifest
# ---------------------------------------------------------------------------

TINY_UNET = dict(block_out_channels=(32, 64), layers_per_block=1,
                 cross_attention_dim=32)
TINY_VAE = dict(block_out_channels=(32, 64), layers_per_block=2)


def test_unet_mirror_matches_manifest_tiny():
    from tests.torch_ref.unet import TorchUNet2DConditionModel

    mirror = _meta(TorchUNet2DConditionModel, heads=2, **TINY_UNET)
    assert_matches(_param_surface(mirror), sd_unet_manifest(**TINY_UNET),
                   "tiny torch UNet mirror")


def test_vae_mirror_matches_manifest_tiny():
    from tests.torch_ref.vae import TorchAutoencoderKL

    mirror = _meta(TorchAutoencoderKL,
                   block_out_channels=TINY_VAE["block_out_channels"])
    assert_matches(_param_surface(mirror), sd_vae_manifest(**TINY_VAE),
                   "tiny torch VAE mirror")


@pytest.mark.slow
def test_unet_mirror_matches_manifest_sd_scale():
    """The 859M-param mirror covers the official SD v1.4 unet surface
    exactly — 686 tensors, every key and shape."""
    from tests.torch_ref.unet import TorchUNet2DConditionModel

    mirror = _meta(TorchUNet2DConditionModel)
    manifest = sd_unet_manifest()
    assert len(manifest) > 600  # sanity: full SD scale, not a stub
    assert_matches(_param_surface(mirror), manifest, "torch UNet mirror")

    # split3 adds ONLY the to_k_dis/to_v_dis banks on cross-attn sites —
    # the pretrained surface itself is untouched
    mirror3 = _meta(TorchUNet2DConditionModel, split3=True)
    surf3 = _param_surface(mirror3)
    extra = set(surf3) - set(manifest)
    assert extra and all(
        k.endswith(("to_k_dis.weight", "to_v_dis.weight")) for k in extra
    )
    missing, _, mismatched = diff_manifest(surf3, manifest)
    assert not missing and not mismatched


@pytest.mark.slow
def test_vae_mirror_matches_manifest_sd_scale():
    from tests.torch_ref.vae import TorchAutoencoderKL

    mirror = _meta(TorchAutoencoderKL)
    manifest = sd_vae_manifest()
    assert len(manifest) > 240
    assert_matches(_param_surface(mirror), manifest, "torch VAE mirror")


# ---------------------------------------------------------------------------
# (b) converters consume the manifest exactly
# ---------------------------------------------------------------------------

def _synth_state_dict(manifest, dtype=np.float32):
    return {k: np.zeros(s, dtype) for k, s in manifest.items()}


def _init_shapes(module, *args):
    import jax

    return jax.eval_shape(lambda k: module.init(k, *args),
                          jax.random.PRNGKey(0))


def _unet_args(ctx_dim, n_tokens):
    import jax.numpy as jnp

    return (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
            jnp.zeros((1, n_tokens, ctx_dim)), 0.0)


def test_unet_converter_consumes_manifest_tiny():
    from psd_tpu.convert.sd import convert_sd_unet, verify_params_match
    from psd_tpu.models.unet import UNet2DCondition, UNetConfig

    manifest = sd_unet_manifest(**TINY_UNET)
    converted = convert_sd_unet(_synth_state_dict(manifest),
                                warm_start_kv_dis=False)
    model = UNet2DCondition(UNetConfig(
        block_out_channels=TINY_UNET["block_out_channels"],
        layers_per_block=1, num_heads=2, cross_attention_dim=32,
        attn_mode="plain"))
    shapes = _init_shapes(model, *_unet_args(32, 8))
    verify_params_match(converted["params"], shapes["params"])


def test_vae_converter_consumes_manifest_tiny():
    import jax.numpy as jnp

    from psd_tpu.convert.sd import convert_sd_vae, verify_params_match
    from psd_tpu.models.vae import AutoencoderKL, VAEConfig

    manifest = sd_vae_manifest(**TINY_VAE)
    converted = convert_sd_vae(_synth_state_dict(manifest))
    model = AutoencoderKL(VAEConfig(
        block_out_channels=TINY_VAE["block_out_channels"]))
    shapes = _init_shapes(model, jnp.zeros((1, 32, 32, 3)),
                          __import__("jax").random.PRNGKey(1))
    verify_params_match(converted["params"], shapes["params"])


@pytest.mark.slow
def test_unet_converter_consumes_manifest_sd_scale():
    """Official-surface synth checkpoint → convert_sd_unet → EXACTLY the
    859M-param flax init tree (plain and split3-warm-start modes)."""
    from psd_tpu.convert.sd import (
        convert_sd_unet, unet_name_map, verify_params_match,
    )
    from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config

    manifest = sd_unet_manifest()
    # every manifest key must be consumed by the name map — none dropped
    for key in manifest:
        base = key.rsplit(".", 1)[0]
        assert unet_name_map(base) is not None, f"converter drops {key}"

    sd = _synth_state_dict(manifest)
    converted = convert_sd_unet(sd, warm_start_kv_dis=False)
    shapes = _init_shapes(UNet2DCondition(sd14_unet_config(attn_mode="plain")),
                          *_unet_args(768, 48))
    verify_params_match(converted["params"], shapes["params"])

    converted3 = convert_sd_unet(sd, warm_start_kv_dis=True)
    shapes3 = _init_shapes(
        UNet2DCondition(sd14_unet_config(attn_mode="split3")),
        *_unet_args(768, 48))
    verify_params_match(converted3["params"], shapes3["params"])


@pytest.mark.slow
def test_vae_converter_consumes_manifest_sd_scale():
    import jax
    import jax.numpy as jnp

    from psd_tpu.convert.sd import convert_sd_vae, verify_params_match
    from psd_tpu.models.vae import AutoencoderKL, sd_vae_config

    manifest = sd_vae_manifest()
    converted = convert_sd_vae(_synth_state_dict(manifest))
    shapes = jax.eval_shape(
        lambda k: AutoencoderKL(sd_vae_config()).init(
            k, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0),
    )
    verify_params_match(converted["params"], shapes["params"])


# ---------------------------------------------------------------------------
# (c) CLIP: manifest == installed transformers implementation (independent
#     public ground truth), and our converter consumes it exactly
# ---------------------------------------------------------------------------

def _hf_clip_vision():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, patch_size=14, image_size=224,
        projection_dim=768,
    )
    with torch.device("meta"):
        return CLIPVisionModelWithProjection(cfg)


def test_clip_manifest_matches_transformers():
    model = _hf_clip_vision()
    assert_matches(_param_surface(model), clip_vision_manifest(),
                   "transformers CLIPVisionModelWithProjection")


def test_clip_converter_consumes_manifest():
    import jax
    import jax.numpy as jnp

    from psd_tpu.convert.clip import convert_clip_vision
    from psd_tpu.convert.sd import verify_params_match
    from psd_tpu.models.clip import CLIPVisionTower, clip_vit_l14_config

    manifest = clip_vision_manifest()
    converted = convert_clip_vision(_synth_state_dict(manifest), num_layers=24)
    shapes = jax.eval_shape(
        lambda k: CLIPVisionTower(clip_vit_l14_config()).init(
            k, jnp.zeros((1, 224, 224, 3))),
        jax.random.PRNGKey(0),
    )
    verify_params_match(converted["params"], shapes["params"])
