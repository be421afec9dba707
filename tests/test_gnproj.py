"""Fused GN-affine → projection kernel tests (ops/gnproj.py).

The kernel consumes the per-(batch, channel) affine from
ops/norms.group_norm_fold, so the two together must equal
GroupNorm → matmul exactly. TPU-gated in the model; interpret mode covers
the kernel math and the custom VJP here (same pattern as test_geglu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.gnproj import _xla_reference, gn_proj
from psd_tpu.ops.norms import group_norm, group_norm_fold


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _inputs(B=2, H=8, W=8, C=64, N=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    gs = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    gb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    wi = jax.random.normal(ks[3], (C, N), jnp.float32) * 0.05
    bi = jnp.linspace(-0.2, 0.2, N, dtype=jnp.float32)
    return x, gs, gb, wi, bi


def test_gn_proj_matches_groupnorm_matmul():
    x, gs, gb, wi, bi = _inputs()
    B, H, W, C = x.shape
    w, b = group_norm_fold(x, gs, gb, num_groups=8, eps=1e-6)
    out = gn_proj(
        x.reshape(B, H * W, C), w, b, (wi,), (bi,), interpret=True
    )[0]
    ref = (
        jnp.dot(group_norm(x, gs, gb, 8, 1e-6).reshape(B, H * W, C), wi) + bi
    )
    assert out.shape == ref.shape
    assert _rel(out, ref) < 2e-6


def test_gn_proj_multi_output_mixed_bias():
    x, gs, gb, wi, bi = _inputs(N=128)
    B, H, W, C = x.shape
    w, b = group_norm_fold(x, gs, gb, num_groups=8, eps=1e-6)
    w2 = jax.random.normal(jax.random.PRNGKey(9), (C, 64), jnp.float32) * 0.05
    outs = gn_proj(
        x.reshape(B, H * W, C), w, b, (wi, w2), (bi, None), interpret=True
    )
    refs = _xla_reference(x.reshape(B, H * W, C), w, b, (wi, w2), (bi, None))
    assert len(outs) == 2
    for o, r in zip(outs, refs):
        assert _rel(o, r) < 2e-6


def test_gn_proj_vjp():
    x, gs, gb, wi, bi = _inputs()
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C)
    w, b = group_norm_fold(x, gs, gb, num_groups=8, eps=1e-6)

    f = lambda xf, w, b, wi, bi: gn_proj(
        xf, w, b, (wi,), (bi,), interpret=True
    )[0].sum()
    g = lambda xf, w, b, wi, bi: _xla_reference(
        xf, w, b, (wi,), (bi,)
    )[0].sum()
    g1 = jax.grad(f, argnums=(0, 1, 2, 3))(xf, w, b, wi, bi)
    g2 = jax.grad(g, argnums=(0, 1, 2, 3))(xf, w, b, wi, bi)
    for a, r in zip(g1, g2):
        assert _rel(a, r) < 1e-4
