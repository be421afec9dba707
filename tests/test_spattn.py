"""Single-pass spatial attention kernel tests (ops/spattn.py).

CPU interpret-mode value/gradient checks against the XLA reference math —
the kernel serving the UNet self-attention sites on TPU (SURVEY.md §2.1
FlashAttention row)."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.spattn import _xla_reference, spatial_attention


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _make(B=1, S=256, H=2, D=40, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    return q, k, v


def _ref(q, k, v):
    B, S, H, D = q.shape
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    return (
        _xla_reference(qt, kt, vt, D**-0.5)
        .reshape(B, H, S, D)
        .transpose(0, 2, 1, 3)
    )


def test_forward_matches_reference():
    q, k, v = _make()
    out = spatial_attention(q, k, v, interpret=True)
    assert out is not None
    assert _rel(out, _ref(q, k, v)) < 5e-3


def test_head_dim_80():
    q, k, v = _make(B=2, S=512, H=2, D=80, seed=1)
    out = spatial_attention(q, k, v, block_q=256, interpret=True)
    assert _rel(out, _ref(q, k, v)) < 5e-3


def test_gradients_match_reference():
    q, k, v = _make(S=256)

    g1 = jax.grad(lambda q, k, v: spatial_attention(q, k, v, interpret=True).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: _ref(q, k, v).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert _rel(a, b) < 5e-3


def test_fallback_on_unsupported_shapes():
    # ragged seq / cross shapes must return None (caller falls back)
    q, k, v = _make(S=256)
    assert spatial_attention(q[:, :100], k[:, :100], v[:, :100]) is None
    assert spatial_attention(q, k[:, :128], v[:, :128]) is None


def test_quant_modes_track_reference():
    """int8 QK^T (and +PV) error bands: exact per-row dequant keeps errors
    in the int8 rounding band (the quality gate behind quant= modes)."""
    q, k, v = _make(S=256)
    ref = spatial_attention(q, k, v, interpret=True)
    qk8 = spatial_attention(q, k, v, quant="qk8", interpret=True)
    full = spatial_attention(q, k, v, quant="int8", interpret=True)
    assert _rel(qk8, ref) < 0.02
    assert _rel(full, ref) < 0.04
