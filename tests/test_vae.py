"""AutoencoderKL structural tests."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.models.vae import (
    AutoencoderKL,
    sample_gaussian,
    sd_vae_config,
    tiny_vae_config,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_sd_vae_param_count():
    vae = AutoencoderKL(sd_vae_config())
    pv = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0),
    )
    # diffusers AutoencoderKL for SD v1.x
    assert _param_count(pv) == 83_653_863


def test_tiny_roundtrip_shapes_and_downscale():
    cfg = tiny_vae_config()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    mean, logvar = vae.apply(params, x, method=vae.encode)
    # 2 blocks → one downsample → /2 spatial
    assert mean.shape == (2, 16, 16, 4) and logvar.shape == mean.shape
    recon = vae.apply(params, mean, method=vae.decode)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_encode_decode_deterministic_mean_path():
    cfg = tiny_vae_config()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    m1, _ = vae.apply(params, x, method=vae.encode)
    m2, _ = vae.apply(params, x, method=vae.encode)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_gaussian_sampling_stats():
    mean = jnp.full((4, 8, 8, 4), 2.0)
    logvar = jnp.zeros((4, 8, 8, 4))  # std=1
    zs = sample_gaussian(mean, logvar, jax.random.PRNGKey(0))
    z = np.asarray(zs)
    assert abs(z.mean() - 2.0) < 0.1
    assert abs(z.std() - 1.0) < 0.1
    # logvar clamp occurs in encode(); sample respects std = exp(logvar/2)
    zs2 = sample_gaussian(mean, jnp.full_like(logvar, -30.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(zs2), 2.0, atol=1e-3)


def test_final_conv_bf16_operands_match_fp32():
    """The final 3x3 convs default to compute-dtype operands with fp32
    accumulation (their 3/8-channel outputs pad to 128 MXU lanes either
    way; fp32 operands only quarter the rate). In bf16 the two paths must
    agree to bf16 rounding; in fp32 they are the same program."""
    cfg_fast = tiny_vae_config(dtype=jnp.bfloat16)
    cfg_slow = tiny_vae_config(dtype=jnp.bfloat16, final_conv_fp32=True)
    vf, vs = AutoencoderKL(cfg_fast), AutoencoderKL(cfg_slow)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3), jnp.float32)
    p = vf.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    of, _, _ = vf.apply(p, x, jax.random.PRNGKey(3))
    os_, _, _ = vs.apply(p, x, jax.random.PRNGKey(3))
    rel = float(
        np.linalg.norm(np.asarray(of - os_))
        / max(np.linalg.norm(np.asarray(os_)), 1e-12)
    )
    assert rel < 2e-2, rel  # bf16 operand rounding only

    # fp32 config: operand dtype is fp32 either way -> identical
    cf = tiny_vae_config(dtype=jnp.float32)
    cs = tiny_vae_config(dtype=jnp.float32, final_conv_fp32=True)
    v1, v2 = AutoencoderKL(cf), AutoencoderKL(cs)
    o1, _, _ = v1.apply(p, x, jax.random.PRNGKey(3))
    o2, _, _ = v2.apply(p, x, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
