"""Fused LN→GEGLU / LN→projection kernel tests (ops/geglu.py).

These kernels are TPU-gated in the model, so the golden UNet tests never
execute them on CPU — interpret mode covers the kernel math and custom
VJPs directly here."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.geglu import (
    _xla_ln_proj,
    _xla_reference,
    ln_geglu,
    ln_proj,
    ln_reference,
)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _inputs(M=512, C=64, N8=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (M, C), jnp.float32)
    s = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    w0 = jax.random.normal(ks[3], (C, 2 * N8), jnp.float32) * 0.05
    b0 = jnp.linspace(-0.2, 0.2, 2 * N8, dtype=jnp.float32)
    return x, s, b, w0, b0


def test_ln_geglu_matches_reference():
    x, s, b, w0, b0 = _inputs()
    out = ln_geglu(x, s, b, w0, b0, interpret=True)
    ref = _xla_reference(x, s, b, w0, b0, 1e-5)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 2e-5  # erf polynomial ≈ 1.5e-7 abs


def test_ln_geglu_vjp_matches_reference():
    x, s, b, w0, b0 = _inputs(M=512, C=64, N8=128)

    f = lambda x, s, b, w0, b0: ln_geglu(x, s, b, w0, b0,
                                         interpret=True).sum()
    g = lambda x, s, b, w0, b0: _xla_reference(x, s, b, w0, b0, 1e-5).sum()
    g1 = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, s, b, w0, b0)
    g2 = jax.grad(g, argnums=(0, 1, 2, 3, 4))(x, s, b, w0, b0)
    for a, r in zip(g1, g2):
        assert _rel(a, r) < 1e-4


def test_ln_proj_matches_reference_multi_head():
    x, s, b, _, _ = _inputs(C=128)
    ws = tuple(
        jax.random.normal(jax.random.PRNGKey(10 + i), (128, 128), jnp.float32)
        * 0.05
        for i in range(3)
    )
    outs = ln_proj(x, s, b, ws, interpret=True)
    refs = _xla_ln_proj(x, s, b, ws, 1e-5)
    assert len(outs) == 3
    for o, r in zip(outs, refs):
        assert _rel(o, r) < 2e-5


def test_ln_proj_vjp():
    x, s, b, _, _ = _inputs(M=512, C=64)
    ws = (jax.random.normal(jax.random.PRNGKey(11), (64, 64), jnp.float32) * 0.05,)

    f = lambda x, ws: sum(o.sum() for o in ln_proj(x, s, b, ws, interpret=True))
    g = lambda x, ws: sum(o.sum() for o in _xla_ln_proj(x, s, b, ws, 1e-5))
    g1 = jax.grad(f, argnums=(0, 1))(x, ws)
    g2 = jax.grad(g, argnums=(0, 1))(x, ws)
    assert _rel(g1[0], g2[0]) < 1e-4
    assert _rel(g1[1][0], g2[1][0]) < 1e-4


def test_ln_reference_matches_flax_layernorm():
    import flax.linen as nn

    x, s, b, _, _ = _inputs()
    ln = nn.LayerNorm(epsilon=1e-5)
    params = {"params": {"scale": s, "bias": b}}
    ref = ln.apply(params, x)
    out = ln_reference(x, s, b)
    assert _rel(out, ref) < 1e-6
