"""Golden numerical parity: flax AutoencoderKL vs the torch mirror of
diffusers' AutoencoderKL (tests/torch_ref/vae.py).

Validates the converter on the real SD VAE key structure (encoder/decoder/
mid_block.attentions.0.group_norm/to_q/..., quant_conv, post_quant_conv) and
the forward math: encode moments (mean/logvar incl. the -30/20 clamp) and
decode must match torch to fp32 tolerance. Reference loads this model at
src/models/vae/vae.py:60-65.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from psd_tpu.convert.sd import convert_sd_vae, verify_params_match
from psd_tpu.models.vae import AutoencoderKL, VAEConfig, sd_vae_config

from .torch_ref.vae import TorchAutoencoderKL


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.04)
        for _, m in model.named_modules():
            if isinstance(m, torch.nn.GroupNorm):
                m.weight.fill_(1.0)
                m.bias.fill_(0.0)


def _pair(cfg: VAEConfig, torch_model, B=1, H=32, W=32, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(B, H, W, 3)).astype(np.float32)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_sd_vae(sd)
    vae = AutoencoderKL(cfg)
    init_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0),
    )
    verify_params_match(params["params"], init_shapes["params"])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        mean_t, logvar_t = torch_model.encode_moments(xt)
        dec_t = torch_model.decode(mean_t)
    mean_j, logvar_j = vae.apply(params, jnp.asarray(x), method="encode")
    dec_j = vae.apply(params, mean_j, method="decode")
    return (
        (mean_t.permute(0, 2, 3, 1).numpy(), logvar_t.permute(0, 2, 3, 1).numpy(),
         dec_t.permute(0, 2, 3, 1).numpy()),
        (np.asarray(mean_j), np.asarray(logvar_j), np.asarray(dec_j)),
    )


def test_vae_golden_tiny():
    torch_model = TorchAutoencoderKL(block_out_channels=(32, 64),
                                     layers_per_block=1)
    _randomize(torch_model, 5)
    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                    dtype=jnp.float32)
    (mt, lt, dt), (mj, lj, dj) = _pair(cfg, torch_model, H=32, W=32)
    np.testing.assert_allclose(mj, mt, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(lj, lt, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(dj, dt, rtol=2e-4, atol=3e-5)


def test_vae_golden_tiny_odd_size():
    """Asymmetric encoder down-pad shows up only at odd spatial sizes."""
    torch_model = TorchAutoencoderKL(block_out_channels=(32, 64),
                                     layers_per_block=1)
    _randomize(torch_model, 9)
    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                    dtype=jnp.float32)
    (mt, lt, dt), (mj, lj, dj) = _pair(cfg, torch_model, H=30, W=34)
    np.testing.assert_allclose(mj, mt, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_vae_golden_sd_scale():
    """Full SD VAE (83.7M params), 64x64 image -> 8x8 latents round trip."""
    torch_model = TorchAutoencoderKL()
    _randomize(torch_model, 13)
    cfg = sd_vae_config(dtype=jnp.float32)
    (mt, lt, dt), (mj, lj, dj) = _pair(cfg, torch_model, H=64, W=64)
    np.testing.assert_allclose(mj, mt, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(dj, dt, rtol=1e-3, atol=1e-4)
