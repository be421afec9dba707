"""W8A8 int8 quantized-op tests (ops/quant.py).

Verifies the quantized primitives against fp32 reference math (error must
stay in the dynamic-quant noise band) and that the tiny UNet's int8 mode
tracks the bf16/fp32 path closely — the quality gate behind enabling
`quant="int8"` for bench/serving (docs/perf_notes.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.ops.quant import qconv3x3, qdense, quant_cols, quant_rows


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quant_roundtrip_rows():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 256), jnp.float32)
    q, s = quant_rows(x)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    assert _rel(back, x) < 0.01  # 8-bit symmetric: ~0.4% rms on gaussians


def test_quant_roundtrip_cols():
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64), jnp.float32)
    q, s = quant_cols(w, axis=-1)
    back = q.astype(jnp.float32) * s
    assert _rel(back, w) < 0.01


def test_qdense_matches_fp32():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (64, 320), jnp.float32)
    w = jax.random.normal(kw, (320, 640), jnp.float32) * 0.02
    b = jnp.linspace(-1, 1, 640, dtype=jnp.float32)
    ref = x @ w + b
    out = qdense(x, w, b, out_dtype=jnp.float32)
    assert _rel(out, ref) < 0.01


def test_qdense_batched_rank3():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 320), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (320, 320), jnp.float32) * 0.02
    ref = jnp.einsum("bsk,kn->bsn", x, w)
    out = qdense(x, w, out_dtype=jnp.float32)
    assert _rel(out, ref) < 0.015


def test_qdense_outlier_row_isolated():
    """Per-row scales: one huge row must not destroy other rows' precision."""
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 128), jnp.float32)
    x = x.at[0].mul(1000.0)
    w = jax.random.normal(jax.random.PRNGKey(6), (128, 64), jnp.float32) * 0.05
    ref = x @ w
    out = qdense(x, w, out_dtype=jnp.float32)
    assert _rel(out[1:], ref[1:]) < 0.01


def test_qconv3x3_matches_fp32():
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (2, 16, 16, 64), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 64, 128), jnp.float32) * 0.05
    b = jnp.linspace(-0.5, 0.5, 128, dtype=jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=dn) + b
    out = qconv3x3(x, w, b, out_dtype=jnp.float32)
    assert _rel(out, ref) < 0.02  # per-tensor act scale: coarser than per-row


def test_qconv3x3_stride2():
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(9), (3, 3, 32, 64), jnp.float32) * 0.05
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (2, 2), "SAME",
                                       dimension_numbers=dn)
    out = qconv3x3(x, w, stride=2, out_dtype=jnp.float32)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 0.02


def test_unet_int8_tracks_fp32():
    """Quality gate at tiny scale: the int8 UNet output must track the
    unquantized one (same params) within the dynamic-quant noise band."""
    from dataclasses import replace

    from psd_tpu.models.unet import UNet2DCondition, tiny_unet_config
    from psd_tpu.utils.fast_init import fast_init

    cfg = tiny_unet_config(attn_mode="split3")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32), jnp.float32)

    unet = UNet2DCondition(cfg)
    params = fast_init(unet, {"params": jax.random.PRNGKey(2)}, x[:1], t[:1],
                       ctx[:1], 0.0)
    ref = unet.apply(params, x, t, ctx, 0.5)

    unet_q = UNet2DCondition(replace(cfg, quant="int8"))
    out = unet_q.apply(params, x, t, ctx, 0.5)

    assert out.shape == ref.shape
    r = _rel(out, ref)
    cos = float(
        np.sum(np.asarray(out, np.float64) * np.asarray(ref, np.float64))
        / (np.linalg.norm(np.asarray(out, np.float64))
           * np.linalg.norm(np.asarray(ref, np.float64)) + 1e-12)
    )
    assert cos > 0.999, cos
    assert r < 0.05, r


def test_unet_int8_param_tree_unchanged():
    """int8 is an apply-time mode: the param tree must be identical so any
    bf16 checkpoint loads into the quantized model as-is."""
    from dataclasses import replace

    from psd_tpu.models.unet import UNet2DCondition, tiny_unet_config
    from psd_tpu.utils.fast_init import fast_init

    cfg = tiny_unet_config(attn_mode="split3")
    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 48, 32), jnp.float32)
    p0 = fast_init(UNet2DCondition(cfg), {"params": jax.random.PRNGKey(0)},
                   x, t, ctx, 0.0)
    p1 = fast_init(UNet2DCondition(replace(cfg, quant="int8")),
                   {"params": jax.random.PRNGKey(0)}, x, t, ctx, 0.0)
    s0 = jax.tree_util.tree_structure(p0)
    s1 = jax.tree_util.tree_structure(p1)
    assert s0 == s1
    shapes_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, p0, p1)
    )
    assert shapes_equal
