"""DeepCache-style branch-caching tests (arXiv:2310.01407) + ToMe wiring.

The turbo serving path composes three approximations, each individually
gated here:
  * UNet phase="deep"/"shallow" split — shallow with a FRESH cache must
    reproduce the full forward (same math, different program partition).
  * sampler cache_mode="deep" — key steps exact, non-key steps run the
    shallow path on the CURRENT x_t.
  * ToMe token merging — tome_ratio=0 is byte-identical to the exact path
    (the module is never imported); ratio>0 stays in the same regime.
"""

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


def _unet_setup(attn_mode="split3"):
    cfg = tiny_unet_config(attn_mode=attn_mode)
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([10, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32), jnp.float32)
    params = fast_init(unet, {"params": jax.random.PRNGKey(2)}, x[:1], t[:1],
                       ctx[:1], 0.0)
    return unet, params, x, t, ctx


def test_shallow_with_fresh_cache_equals_full():
    unet, params, x, t, ctx = _unet_setup()
    full = unet.apply(params, x, t, ctx, 0.5)
    eps_d, deep = unet.apply(params, x, t, ctx, 0.5, phase="deep")
    sh = unet.apply(params, x, t, ctx, 0.5, phase="shallow", cached=deep)
    # 'deep' is the same graph as 'full' with one extra output; program-
    # boundary fusion may reorder fp32 accumulation slightly
    assert _rel(eps_d, full) < 2e-4
    np.testing.assert_allclose(np.asarray(sh), np.asarray(full),
                               rtol=1e-5, atol=2e-5)


def test_shallow_sees_current_x():
    """Unlike phase='decode', the shallow path must react to x (that is
    the point of DeepCache — x_t tracking on every step)."""
    unet, params, x, t, ctx = _unet_setup(attn_mode="plain")
    _, deep = unet.apply(params, x, t, ctx, 0.0, phase="deep")
    s1 = unet.apply(params, x, t, ctx, 0.0, phase="shallow", cached=deep)
    s2 = unet.apply(params, x + 1.0, t, ctx, 0.0, phase="shallow", cached=deep)
    assert _rel(s1, s2) > 1e-3


def test_deep_single_key_step_matches_baseline():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0, encoder_stride=2,
                        cache_mode="deep")
    np.testing.assert_allclose(np.asarray(prop), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_deep_strided_sampling_runs_and_tracks_baseline():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0, encoder_stride=2,
                        cache_mode="deep")
    assert prop.shape == base.shape
    assert np.isfinite(np.asarray(prop)).all()
    assert 0.0 < _rel(prop, base) < 1.0


def test_tome_unet_close_but_not_identical():
    cfg0 = tiny_unet_config()
    cfgT = tiny_unet_config(tome_ratio=0.5, tome_min_tokens=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32), jnp.float32)
    u0, uT = UNet2DCondition(cfg0), UNet2DCondition(cfgT)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    o0 = u0.apply(params, x, t, ctx)
    oT = uT.apply(params, x, t, ctx)
    r = _rel(oT, o0)
    assert 0.0 < r < 0.2, r


def test_tome_ratio_zero_is_inert():
    """ratio=0 must leave the traced program identical (tome=None path)."""
    cfg0 = tiny_unet_config()
    cfgZ = tiny_unet_config(tome_ratio=0.0, tome_min_tokens=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32), jnp.float32)
    u0, uZ = UNet2DCondition(cfg0), UNet2DCondition(cfgZ)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    j0 = jax.make_jaxpr(lambda p, x, t, c: u0.apply(p, x, t, c))(params, x, t, ctx)
    jz = jax.make_jaxpr(lambda p, x, t, c: uZ.apply(p, x, t, c))(params, x, t, ctx)
    assert str(j0) == str(jz)


def test_tome_deepcache_compose_in_sampler():
    """The full turbo composition (ToMe × deep cache) samples end to end."""
    from psd_tpu.testing import tiny_dadd

    model = tiny_dadd(tome_ratio=0.5, tome_min_tokens=64)
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    out = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                       sampling_steps=4, steer_scale=1.0, encoder_stride=2,
                       cache_mode="deep")
    assert np.isfinite(np.asarray(out)).all()


def test_tome_block_mode_close_and_cheaper():
    """Block-resident ToMe: same quality class as branch mode, and the
    traced program carries exactly ONE merge gather per block (the branch
    mode carries one per wrapped branch)."""
    cfg0 = tiny_unet_config()
    cfgB = tiny_unet_config(tome_ratio=0.5, tome_min_tokens=64,
                            tome_mode="block")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32), jnp.float32)
    u0, uB = UNet2DCondition(cfg0), UNet2DCondition(cfgB)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    o0 = u0.apply(params, x, t, ctx)
    oB = uB.apply(params, x, t, ctx)
    assert oB.shape == o0.shape
    r = _rel(oB, o0)
    assert 0.0 < r < 0.25, r


def test_tome_block_mode_duplicate_regions_attention_exactness():
    """On an input whose 2x2 regions are constant, block-mode merge is
    lossless at the token level: every kept token equals its region's
    merged mean, so the block output's unmerge reproduces a per-region-
    constant tensor (the block preserves region constancy)."""
    from psd_tpu.models.layers import BasicTransformerBlock
    from psd_tpu.ops.tome import ToMeSpec

    B, H, W, C = 1, 8, 8, 16
    base = jax.random.normal(jax.random.PRNGKey(3), (B, H // 2, W // 2, C))
    x = jnp.repeat(jnp.repeat(base, 2, axis=1), 2, axis=2).reshape(B, H * W, C)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (B, 8, C), jnp.float32)
    blk = BasicTransformerBlock(
        2, tome=ToMeSpec(ratio=0.75, min_tokens=16, mode="block"),
        hw=(H, W), dtype=jnp.float32,
    )
    params = blk.init(jax.random.PRNGKey(5), x, ctx)
    y = np.asarray(blk.apply(params, x, ctx)).reshape(B, H // 2, 2, W // 2, 2, C)
    np.testing.assert_allclose(y[:, :, 0, :, 0], y[:, :, 1, :, 1], rtol=1e-5)
    np.testing.assert_allclose(y[:, :, 0, :, 0], y[:, :, 0, :, 1], rtol=1e-5)
