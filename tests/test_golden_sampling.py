"""Golden pixel-level parity of the full sampling path vs torch.

The north-star requirement (BASELINE.json): a fixed-noise DDIM sample through
UNet + VAE must match the PyTorch reference pixel-wise. The torch side below
re-implements the reference's exact sampler math
(inference_pipeline_ip.py:321-470: linspace(T-1 -> 0) timesteps, x0-pred
clamp +-4, deterministic update, final step returns x0) driving the torch
mirror UNet; the JAX side is psd_tpu's single lax.scan sampler with the same
converted weights. Latents AND decoded pixels must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from psd_tpu.convert.sd import convert_sd_unet, convert_sd_vae
from psd_tpu.diffusion.sampler import SamplerConfig, ddim_sample
from psd_tpu.diffusion.schedule import NoiseSchedule
from psd_tpu.models.unet import UNet2DCondition, UNetConfig
from psd_tpu.models.vae import AutoencoderKL, VAEConfig

from .test_golden_unet import _randomize, _strip_dis, _tiny_torch
from .torch_ref.vae import TorchAutoencoderKL


def _torch_ddim(model, x, cond, acp, steps, x0_clip=4.0):
    """Reference DDIM math (inference_pipeline_ip.py:390-470), torch fp32."""
    T = acp.shape[0]
    ts = torch.linspace(T - 1, 0, steps, dtype=torch.float64).long()
    B = x.shape[0]
    with torch.no_grad():
        for i, t in enumerate(ts):
            eps = model(x, t.expand(B), cond)
            a_t = acp[t]
            x0 = (x - (1.0 - a_t).sqrt() * eps) / a_t.sqrt()
            x0 = x0.clamp(-x0_clip, x0_clip)
            if i == steps - 1:
                x = x0
            else:
                a_prev = acp[ts[i + 1]]
                x = a_prev.sqrt() * x0 + (1.0 - a_prev).sqrt() * eps
    return x


@pytest.mark.parametrize("steps", [1, 4, 10])
def test_ddim_latent_parity_tiny(steps):
    torch_unet = _tiny_torch()
    schedule = NoiseSchedule(num_train_timesteps=1000)
    acp_t = torch.from_numpy(schedule.alphas_cumprod.copy())

    rng = np.random.default_rng(42)
    x0 = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ctx = rng.normal(size=(2, 48, 32)).astype(np.float32)

    lat_t = _torch_ddim(
        torch_unet,
        torch.from_numpy(x0).permute(0, 3, 1, 2),
        torch.from_numpy(ctx),
        acp_t, steps,
    ).permute(0, 2, 3, 1).numpy()

    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     num_heads=2, cross_attention_dim=32, dtype=jnp.float32)
    params = convert_sd_unet(_strip_dis(
        {k: v.detach().numpy() for k, v in torch_unet.state_dict().items()}
    ), warm_start_kv_dis=False)
    model = UNet2DCondition(cfg)
    ctx_j = jnp.asarray(ctx)

    def eps_fn(x, t, i):
        return model.apply(params, x, t, ctx_j)

    lat_j = np.asarray(ddim_sample(
        eps_fn, jnp.asarray(x0), schedule, SamplerConfig(sampling_steps=steps)
    ))
    np.testing.assert_allclose(lat_j, lat_t, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_pixel_parity_tiny_end_to_end():
    """Fixed noise -> 10-step DDIM -> VAE decode -> [0,1] pixels: torch and
    JAX must agree to well under 1/255 (pixel-identical after quantization)."""
    torch_unet = _tiny_torch()
    torch_vae = TorchAutoencoderKL(block_out_channels=(32, 64),
                                   layers_per_block=1)
    _randomize(torch_vae, 21)
    schedule = NoiseSchedule(num_train_timesteps=1000)
    acp_t = torch.from_numpy(schedule.alphas_cumprod.copy())

    rng = np.random.default_rng(7)
    noise = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    ctx = rng.normal(size=(1, 48, 32)).astype(np.float32)
    steps = 10

    lat_t = _torch_ddim(torch_unet,
                        torch.from_numpy(noise).permute(0, 3, 1, 2),
                        torch.from_numpy(ctx), acp_t, steps)
    with torch.no_grad():
        img_t = torch_vae.decode(lat_t / 0.18215)
        img_t = (img_t / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy()

    unet_params = convert_sd_unet(_strip_dis(
        {k: v.detach().numpy() for k, v in torch_unet.state_dict().items()}
    ), warm_start_kv_dis=False)
    vae_params = convert_sd_vae(
        {k: v.detach().numpy() for k, v in torch_vae.state_dict().items()}
    )
    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     num_heads=2, cross_attention_dim=32, dtype=jnp.float32)
    model = UNet2DCondition(cfg)
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 64),
                                  layers_per_block=1, dtype=jnp.float32))
    ctx_j = jnp.asarray(ctx)

    def eps_fn(x, t, i):
        return model.apply(unet_params, x, t, ctx_j)

    lat_j = ddim_sample(eps_fn, jnp.asarray(noise), schedule,
                        SamplerConfig(sampling_steps=steps))
    img_j = vae.apply(vae_params, lat_j / 0.18215, method="decode")
    img_j = np.clip(np.asarray(img_j) / 2 + 0.5, 0, 1)

    np.testing.assert_allclose(img_j, img_t, atol=2e-4)
    # 8-bit quantized pixels: identical except values landing exactly on a
    # rounding boundary (fp32 accumulation-order noise), which may differ by 1
    qj = np.round(img_j * 255).astype(np.int32)
    qt = np.round(img_t * 255).astype(np.int32)
    diff = np.abs(qj - qt)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
