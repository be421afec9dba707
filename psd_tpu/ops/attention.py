"""Attention primitives.

Single entry point `dot_product_attention` so the implementation can be
swapped (XLA einsum ↔ Pallas flash kernel) without touching model code.
Softmax always accumulates in fp32 (TPU bf16 softmax loses too much
precision for parity with the fp32 reference math,
attention_processor_base.py:96-101).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"  # "auto": pallas flash on TPU for long self-attn, else XLA


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "auto")
    _BACKEND = name


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head attention.

    Args:
        q: (B, Sq, H, Dh)
        k: (B, Sk, H, Dh)
        v: (B, Sk, H, Dh)
        scale: defaults to 1/sqrt(Dh)

    Returns:
        (B, Sq, H, Dh), dtype of q.
    """
    # under an active >1-device mesh the kernels shard_map themselves over
    # the batch axes (ops/{spattn,flash}.py) and return None when the local
    # batch can't be formed — the XLA einsum below partitions via GSPMD
    if _BACKEND in ("pallas", "auto"):
        from ..core.mode import is_training, kernel_backend_ok
        from . import flash, spattn

        on_tpu = kernel_backend_ok()
        if on_tpu and q.shape[1] >= 512 and not is_training():
            # single-pass kernel for inference (its VJP recomputes the
            # forward — training uses the flash kernel's fused backward)
            out = spattn.spatial_attention(q, k, v, scale=scale)
            if out is not None:
                return out
        out = flash.flash_attention(q, k, v, scale=scale)
        if out is not None:
            return out

    dh = q.shape[-1]
    scale = scale if scale is not None else dh**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, scale: Optional[float] = None):
    """Explicit softmax(QKᵀ/√d) probabilities, fp32: needed by the 2-segment
    post-softmax token-rescale path (attention_processor_base.py:103-116)."""
    dh = q.shape[-1]
    scale = scale if scale is not None else dh**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits * scale, axis=-1)
