"""End-to-end DADD assembly tests on tiny configs (SURVEY.md §4c/§4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.testing import tiny_dadd


@pytest.fixture(scope="module")
def dadd_and_params():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), image_size=32)
    return model, params


@pytest.mark.slow
def test_train_loss_finite_and_grads_flow(dadd_and_params):
    model, params = dadd_and_params
    B = 2
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.array([0.0, 3.0]),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }

    def loss_fn(p):
        loss, metrics = model.train_loss(p, batch, jax.random.PRNGKey(3))
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "min_snr_weight_mean" in metrics
    g_leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in g_leaves)
    # gradient reaches the AOE deltas and the UNet
    g = grads["params"]
    assert np.abs(np.asarray(g["ordinal_embedder"]["deltas"])).sum() > 0
    assert np.abs(np.asarray(g["unet"]["conv_in"]["kernel"])).sum() > 0


def test_progression_sampling_shared_noise(dadd_and_params):
    model, params = dadd_and_params
    targets = jnp.linspace(0.0, 3.0, 5)
    sources = jnp.full((5,), 1.0)
    clip_feats = jnp.tile(
        jax.random.normal(jax.random.PRNGKey(4), (1, 17, 32)), (5, 1, 1)
    )
    cond = model.prepare_inference_cond(params, targets, sources, clip_feats)
    assert cond.shape == (5, 12, 32)  # [aoe|img|delta] 4+4+4 tokens
    lat = model.sample(
        params, cond, jax.random.PRNGKey(5), image_size=32, sampling_steps=4,
        steer_scale=1.0,
    )
    # tiny VAE downscales by 2 → 32² images sample in 16² latent space
    assert lat.shape == (5, 16, 16, 4)
    assert np.isfinite(np.asarray(lat)).all()
    # delta steering: different target labels give different outputs even
    # with shared init noise
    assert not np.allclose(np.asarray(lat[0]), np.asarray(lat[-1]))


def test_delta_tokens_zero_at_train_cond(dadd_and_params):
    model, params = dadd_and_params
    labels = jnp.array([1.0, 2.0])
    clip_feats = jax.random.normal(jax.random.PRNGKey(6), (2, 17, 32))
    cond = model.core.apply(
        params, labels, clip_feats, None, False, False, 1.0, None,
        method=model.core.prepare_conditioning,
    )
    # last 4 tokens are the delta segment; source==target → exactly zero
    np.testing.assert_allclose(np.asarray(cond[:, -4:, :]), 0.0, atol=1e-6)


def test_baseline_mode_cfg_sampling():
    model = tiny_dadd(routing=False, purifier=False, plus=False)
    params = model.init_core(jax.random.PRNGKey(0), image_size=32)
    targets = jnp.array([2.0, 2.0])
    sources = jnp.zeros((2,))
    clip_feats = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    cond = model.prepare_inference_cond(params, targets, sources, clip_feats)
    assert cond.shape == (2, 8, 32)  # [AOE(4) | IP(4)]
    uncond = model.prepare_inference_cond(
        params, targets, sources, clip_feats, zero_aoe=True
    )
    lat = model.sample(
        params, cond, jax.random.PRNGKey(2), image_size=32, sampling_steps=4,
        guidance_scale=3.0, cond_uncond=uncond,
    )
    assert lat.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(lat)).all()
    # dual-pass CFG composes with the DPM-Solver++ sampler too
    lat_dpm = model.sample(
        params, cond, jax.random.PRNGKey(2), image_size=32, sampling_steps=4,
        guidance_scale=3.0, cond_uncond=uncond, sampler="dpm",
    )
    assert lat_dpm.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(lat_dpm)).all()
    assert not np.allclose(np.asarray(lat_dpm), np.asarray(lat))


def test_vae_encode_decode_through_dadd(dadd_and_params):
    model, params = dadd_and_params
    vae_params = model.vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
    )
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
    lat = model.encode_latents(vae_params, imgs, jax.random.PRNGKey(3))
    assert lat.shape == (2, 16, 16, 4)
    out = model.decode_latents(vae_params, lat)
    assert out.shape == (2, 32, 32, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_base_module_ordinal_only():
    """BASELINE.json config #1: base module, no image conditioning (BOE)."""
    model = tiny_dadd(image_cond=False)
    object.__setattr__(model.core_cfg, "embedder_type", "aoe")  # frozen dataclass
    params = model.init_core(jax.random.PRNGKey(0), image_size=32)
    cond = model.core.apply(
        params, jnp.array([1.5]), None, None, False, False, 1.0, None,
        method=model.core.prepare_conditioning,
    )
    assert cond.shape == (1, 4, 32)
    lat = model.sample(params, cond, jax.random.PRNGKey(1), image_size=32,
                       sampling_steps=4)
    assert lat.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(lat)).all()


@pytest.mark.slow
def test_dp_sharded_sampling_on_mesh(dadd_and_params):
    """Multi-chip serving path: batch shards over dp, output matches the
    single-device result exactly."""
    from psd_tpu.parallel.mesh import MeshConfig, create_mesh

    model, params = dadd_and_params
    mesh = create_mesh(MeshConfig(dp=8))
    targets = jnp.linspace(0.0, 3.0, 8)
    sources = jnp.full((8,), 1.0)
    clip_feats = jnp.tile(
        jax.random.normal(jax.random.PRNGKey(4), (1, 17, 32)), (8, 1, 1)
    )
    cond = model.prepare_inference_cond(params, targets, sources, clip_feats)
    lat_single = model.sample(
        params, cond, jax.random.PRNGKey(5), image_size=32, sampling_steps=4,
        steer_scale=1.0,
    )
    lat_sharded = model.sample(
        params, cond, jax.random.PRNGKey(5), image_size=32, sampling_steps=4,
        steer_scale=1.0, mesh=mesh,
    )
    # atol covers CPU vectorization/reduction-order noise between the B=1-
    # per-device and B=8 compilations (amplified over the DDIM steps)
    np.testing.assert_allclose(
        np.asarray(lat_sharded), np.asarray(lat_single), rtol=2e-4, atol=1e-4
    )
