"""Fused upsample+conv tests: the 4-phase 2×2 decomposition must be exact
(same math, fewer taps) vs the unfused nearest-up2 → conv3x3 reference."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.upconv import upsample2x_conv3x3, upsample2x_conv3x3_reference


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_matches_reference_fp32():
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 8, 8, 16), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 16, 24), jnp.float32) * 0.1
    b = jnp.linspace(-1, 1, 24, dtype=jnp.float32)
    out = upsample2x_conv3x3(x, k, b)
    ref = upsample2x_conv3x3_reference(x, k, b)
    assert out.shape == (2, 16, 16, 24)
    assert _rel(out, ref) < 1e-6


def test_matches_reference_rect():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 6, 8), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 8), jnp.float32) * 0.1
    assert _rel(upsample2x_conv3x3(x, k), upsample2x_conv3x3_reference(x, k)) < 1e-6


def test_gradients_flow():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 4), jnp.float32) * 0.1
    g1 = jax.grad(lambda k: upsample2x_conv3x3(x, k).sum())(k)
    g2 = jax.grad(lambda k: upsample2x_conv3x3_reference(x, k).sum())(k)
    assert _rel(g1, g2) < 1e-5


def test_bf16_module_gradients():
    """bf16 params/compute path must be differentiable (the conv transpose
    rule rejects mixed-dtype cotangents if an explicit fp32 accumulator
    dtype is requested — regression for the train-step crash)."""
    from psd_tpu.models.layers import Upsample2D

    m = Upsample2D(8, dtype=jnp.bfloat16)
    x = jnp.ones((1, 4, 4, 8), jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: m.apply(p, x).astype(jnp.float32).sum())(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
