"""Micro-batching generation server tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.pipelines.serve import GenerationServer
from psd_tpu.testing import tiny_dadd


def test_server_batches_and_fulfills():
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    server = GenerationServer(model, core, vae, image_size=32,
                              sampling_steps=2, max_batch=4, max_wait_s=0.2)
    rng = np.random.default_rng(0)
    futures = [
        server.submit(rng.normal(size=(17, 32)).astype(np.float32),
                      target_label=t, source_label=1.0, seed=0)
        for t in [0.0, 1.0, 2.0, 3.0, 1.5]  # 5 requests > max_batch
    ]
    images = [f.result(timeout=300) for f in futures]
    server.close()
    assert all(img.shape == (32, 32, 3) for img in images)
    assert all(np.isfinite(img).all() for img in images)
    # different targets produce different images
    assert not np.allclose(images[0], images[3])


def test_server_partial_batch_padding():
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    server = GenerationServer(model, core, vae, image_size=32,
                              sampling_steps=2, max_batch=8, max_wait_s=0.05)
    rng = np.random.default_rng(1)
    f = server.submit(rng.normal(size=(17, 32)).astype(np.float32), 2.0, 0.0)
    img = f.result(timeout=300)
    server.close()
    assert img.shape == (32, 32, 3)


def test_server_pipelined_multi_batch():
    """pipeline_depth=2 keeps batches in flight without dropping or
    reordering fulfillment: every request across 4+ batches resolves to a
    finite image and close() drains the in-flight queue."""
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    server = GenerationServer(model, core, vae, image_size=32,
                              sampling_steps=2, max_batch=2, max_wait_s=0.05,
                              pipeline_depth=2)
    rng = np.random.default_rng(3)
    futures = [
        server.submit(rng.normal(size=(17, 32)).astype(np.float32),
                      target_label=float(i % 4), source_label=0.0, seed=i)
        for i in range(9)  # 5 batches at max_batch=2, last partial
    ]
    images = [f.result(timeout=300) for f in futures]
    server.close()
    assert all(img.shape == (32, 32, 3) for img in images)
    assert all(np.isfinite(img).all() for img in images)
    assert not server._worker.is_alive()


def test_server_close_drains_inflight():
    """Requests submitted immediately before close() still resolve — the
    worker flushes in-flight dispatches before exiting."""
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    server = GenerationServer(model, core, vae, image_size=32,
                              sampling_steps=2, max_batch=2, max_wait_s=0.05,
                              pipeline_depth=3)
    rng = np.random.default_rng(4)
    futures = [
        server.submit(rng.normal(size=(17, 32)).astype(np.float32),
                      1.0, 0.0, seed=i)
        for i in range(5)
    ]
    server.close()
    images = [f.result(timeout=300) for f in futures]
    assert all(img.shape == (32, 32, 3) for img in images)
    assert not server._worker.is_alive()


def test_server_unfused_matches_fused():
    """fused=False (two dispatches: sample then decode — the mesh path)
    produces the same images as the fused single-dispatch path."""
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(17, 32)).astype(np.float32)
    out = {}
    for fused in (True, False):
        server = GenerationServer(model, core, vae, image_size=32,
                                  sampling_steps=2, max_batch=1,
                                  max_wait_s=0.05, fused=fused,
                                  pipeline_depth=1)
        out[fused] = server.submit(feats, 2.0, 0.0, seed=7).result(timeout=300)
        server.close()
    np.testing.assert_allclose(out[True], out[False], atol=2e-2)


def test_server_dpm_turbo_knobs():
    """The turbo serving knobs (DPM sampler + DeepCache) work end to end."""
    model = tiny_dadd()
    core = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae = model.vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jax.random.PRNGKey(2))
    server = GenerationServer(model, core, vae, image_size=32,
                              sampling_steps=4, max_batch=2, max_wait_s=0.05,
                              encoder_stride=2, cache_mode="deep",
                              sampler="dpm")
    rng = np.random.default_rng(2)
    f = server.submit(rng.normal(size=(17, 32)).astype(np.float32), 3.0, 0.0)
    img = f.result(timeout=300)
    server.close()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
