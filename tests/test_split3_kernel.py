"""Fused triple-pathway kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.attention import dot_product_attention
from psd_tpu.ops.split3 import split3_attention


def _xla_reference(q, banks, delta, ga, gd):
    ka, va, kd, vd, kl, vl = banks
    z = ga * dot_product_attention(q, ka, va)
    z = z + gd * dot_product_attention(q, kd, vd)
    z = z + delta * dot_product_attention(q, kl, vl)
    return z


def test_split3_kernel_matches_xla_path():
    B, S, H, D, KV = 2, 256, 4, 64, 16
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 7)
    q = jax.random.normal(keys[0], (B, S, H, D), jnp.float32)
    banks = [
        jax.random.normal(k, (B, KV, H, D), jnp.float32) for k in keys[1:7]
    ]
    delta = 1.7
    out = split3_attention(
        q, *banks, jnp.asarray(delta), 0.3, 0.9, None, 128, True,
    )
    ref = _xla_reference(q, banks, delta, 0.3, 0.9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_split3_kernel_delta_zero_drops_pathway():
    B, S, H, D, KV = 1, 128, 2, 32, 8
    keys = jax.random.split(jax.random.PRNGKey(1), 7)
    q = jax.random.normal(keys[0], (B, S, H, D), jnp.float32)
    banks = [jax.random.normal(k, (B, KV, H, D), jnp.float32) for k in keys[1:7]]
    out0 = split3_attention(q, *banks, jnp.asarray(0.0), 0.5, 0.5, None,
                            128, True)
    ref2 = 0.5 * dot_product_attention(q, banks[0], banks[1]) + \
           0.5 * dot_product_attention(q, banks[2], banks[3])
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref2),
                               rtol=2e-4, atol=2e-5)


def test_split3_kernel_gradients_match_xla():
    """Custom VJP (XLA-math backward) vs autodiff through the plain path."""
    from psd_tpu.ops.split3 import _xla_split3

    B, S, H, D, KV = 1, 128, 2, 32, 8
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    q = jax.random.normal(keys[0], (B, S, H, D), jnp.float32)
    banks = [jax.random.normal(k, (B, KV, H, D), jnp.float32) for k in keys[1:7]]
    delta = jnp.asarray(0.8)

    def loss_kernel(q, *args):
        out = split3_attention(q, *args, 0.4, 0.6, None, 128, True)
        return (out**2).sum()

    def loss_ref(q, *args):
        out = _xla_split3(q, *args, 0.4, 0.6, D**-0.5)
        return (out**2).sum()

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 3, 7))(q, *banks, delta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 7))(q, *banks, delta)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
