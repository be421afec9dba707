"""W8A8 int8 quantized matmul/conv primitives for TPU inference.

The v5e MXU runs int8×int8→int32 at 2× the bf16 rate (measured on-chip:
dot 4096³ 369 TOPS vs 162 TFLOPS bf16; conv3×3 1280ch 2.5×, 640ch 2.0× —
scripts/probe_int8.py). Since the 50-step DDIM sampling step is MXU-bound
(docs/perf_notes.md), an int8 inference mode is the only route past the
bf16 padded-FLOP ceiling (~45 ms/step ≈ 3.3 img/s at batch 8).

Scheme (standard W8A8 dynamic quantization):
  * weights: symmetric per-output-channel scales, quantized inline from the
    bf16 tree — XLA's while-loop LICM hoists the (loop-invariant) weight
    quantization out of the sampling scan, so it costs one pass per batch,
    not per step.
  * activations: symmetric dynamic per-row (per-token) scales for matmuls —
    rows are never contracted, so per-row dequant is exact; per-SAMPLE
    scales for convs (the 3×3 window mixes pixels of one image, so
    per-pixel scales would land inside the contraction, but batch items
    never mix — one outlier can't collapse the whole batch's resolution).
  * accumulation int32 on the MXU, dequant in the fp32 epilogue.

Quality: quantization error is bounded by the per-row/channel amax.
Coverage today (tests/test_quant.py): primitive-level error bands vs fp32
references, and a tiny-UNet int8-vs-fp32 tracking test (cos > 0.999,
rel < 5%). There is NO end-to-end SD-scale sample-quality gate yet — which
is one reason the mode ships default-OFF and bench.py does not enable it
(the other: measured end-to-end step time is neutral, docs/perf_notes.md).

Capability note: the reference has no quantized path (fp16 autocast only,
evaluation_pipeline.py:943); this is a TPU-native extension, default OFF.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8

# int8 MXU matmuls only beat bf16 for deep contractions on v5e (measured,
# scripts/probe_int8.py: K=320 0.9-1.0x, K=512 1.2x, K=1280 1.8x, K=4096
# 2.3x). Below this K the conversion/pipeline overhead eats the rate win.
MIN_QUANT_K = 512


def quant_worthwhile(k: int) -> bool:
    return k >= MIN_QUANT_K


def quant_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization of a (..., K) activation.

    Returns (q, scale) with q int8 of x's shape and scale fp32 of shape
    (..., 1): x ≈ q * scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def quant_cols(w: jnp.ndarray, axis: int = -1):
    """Symmetric per-output-channel weight quantization.

    `axis` is the OUTPUT axis (not contracted); scales broadcast there."""
    wf = w.astype(jnp.float32)
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(wf), axis=red, keepdims=True)
    scale = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    q = jnp.round(wf / scale).astype(jnp.int8)
    return q, scale


def qdense(
    x: jnp.ndarray,  # (..., K)
    w: jnp.ndarray,  # (K, N) bf16/fp32 — quantized inline (LICM-hoisted)
    b: Optional[jnp.ndarray] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """int8×int8→int32 MXU matmul with dynamic per-row activation scales.

    Falls back to a bf16 MXU matmul for shallow contractions where int8
    does not pay (see MIN_QUANT_K)."""
    out_dtype = out_dtype or x.dtype
    if not quant_worthwhile(x.shape[-1]):
        out = jnp.dot(
            x.astype(out_dtype), w.astype(out_dtype),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(out_dtype)
    xq, sx = quant_rows(x)
    wq, sw = quant_cols(w, axis=-1)  # (K,N) → scale (1,N)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw.reshape(1, -1)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)


def qconv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    w: jnp.ndarray,  # (3, 3, Cin, Cout)
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """int8 SAME conv with per-sample act scales + per-Cout weight scales.

    Per-sample (not per-tensor) activation scales: one outlier activation
    in a batch element cannot collapse int8 resolution for the others
    (ADVICE r2). Zero padding is exact under symmetric quantization
    (0 → 0)."""
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)  # (B,1,1,1)
    sx = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    wq, sw = quant_cols(w, axis=-1)  # (1,1,1,Cout)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)


def qdense_pre(
    x: jnp.ndarray,
    wq: jnp.ndarray,  # (K, N) int8, pre-quantized
    sw: jnp.ndarray,  # (N,) or (1, N) fp32
    b: Optional[jnp.ndarray] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """qdense against already-quantized weights (for fused-kernel callers)."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quant_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw.reshape(1, -1)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)
