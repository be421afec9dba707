"""Encoder-propagation sampling tests (Faster Diffusion, arXiv:2312.09608).

The UNet's phase-split must be exact (encode→decode ≡ full forward), key
steps of the strided sampler must reproduce the full computation, and the
approximation path must run end to end. Opt-in feature — stride 1 keeps
the reference-exact math and is the default everywhere."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.models.unet import UNet2DCondition, tiny_unet_config
from psd_tpu.testing import tiny_dadd
from psd_tpu.utils.fast_init import fast_init


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_encode_decode_equals_full_forward():
    cfg = tiny_unet_config(attn_mode="split3")
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([10, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32), jnp.float32)
    params = fast_init(unet, {"params": jax.random.PRNGKey(2)}, x[:1], t[:1],
                       ctx[:1], 0.0)

    full = unet.apply(params, x, t, ctx, 0.5)
    cache = unet.apply(params, x, t, ctx, 0.5, phase="encode")
    h_mid, skips = cache
    assert isinstance(skips, tuple) and len(skips) > 2
    dummy = jnp.zeros((2, 1, 1, 4), jnp.float32)
    dec = unet.apply(params, dummy, t, ctx, 0.5, phase="decode", cached=cache)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_decode_ignores_sample_uses_fresh_t():
    """Decoder-only steps must not read x, but must react to t."""
    cfg = tiny_unet_config(attn_mode="plain")
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4), jnp.float32)
    t1 = jnp.array([100], jnp.int32)
    t2 = jnp.array([900], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 32), jnp.float32)
    params = fast_init(unet, {"params": jax.random.PRNGKey(2)}, x, t1, ctx, 0.0)
    cache = unet.apply(params, x, t1, ctx, 0.0, phase="encode")
    dummy = jnp.zeros((1, 1, 1, 4), jnp.float32)
    d1 = unet.apply(params, dummy, t1, ctx, 0.0, phase="decode", cached=cache)
    d2 = unet.apply(params, dummy, t2, ctx, 0.0, phase="decode", cached=cache)
    # fresh temb changes the decoder output (random-init temb pathways are
    # weak, so the bar is just "measurably nonzero")
    assert _rel(d1, d2) > 1e-6


def test_single_key_step_matches_baseline():
    """steps=1 with stride=2: the only step is a key step (encode+decode),
    so the propagated sampler must equal the baseline exactly."""
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)),
                                        None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0, encoder_stride=2)
    np.testing.assert_allclose(np.asarray(prop), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


def test_strided_sampling_runs_and_tracks_baseline():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)),
                                        None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0, encoder_stride=2)
    assert prop.shape == base.shape
    assert np.isfinite(np.asarray(prop)).all()
    # an approximation, not an identity — but it must stay in the same
    # regime as the exact trajectory
    assert _rel(prop, base) < 1.0
    assert _rel(prop, base) > 0.0  # and actually differ (stale encoder)
