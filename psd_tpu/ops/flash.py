"""Fused (flash) attention dispatch for TPU.

The SD UNet's self-attention at 512² runs at seq len 4096 where naive
attention materializes (B,H,4096,4096) fp32 logits — gigabytes of HBM
traffic per site and the dominant cost of the sampling step (SURVEY.md
§2.1 row "FlashAttention/SDPA"). This wraps the Pallas TPU flash-attention
kernel (jax.experimental.pallas.ops.tpu.flash_attention) with:

  * (B, S, H, D) ↔ (B, H, S, D) layout adaptation
  * block-size selection clamped to the sequence length
  * graceful fallback (returns None) on CPU or tiny sequences so the
    caller uses the XLA einsum path (tests run on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_MIN_SEQ = 512  # below this the einsum path is faster than kernel overhead


@functools.lru_cache(maxsize=None)
def _get_kernel():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as pallas_flash,
    )

    return pallas_flash, BlockSizes


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def flash_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, H, D)
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> Optional[jnp.ndarray]:
    """Fused attention; returns None when the fallback path should be used."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if Sq < _MIN_SEQ or Sk < _MIN_SEQ or Sq % 128 or Sk % 128:
        return None
    if not _on_tpu():
        return None
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    if info is not None:
        # mesh composition: run the kernel per batch (and head, under tp)
        # shard via shard_map — GSPMD can't partition the Mosaic call itself
        mesh, axes, n = info
        if B % n:
            return None
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        tp = mesh.shape.get("tp", 1)
        h_ax = "tp" if (tp > 1 and H % tp == 0) else None
        spec = P(axes, None, h_ax, None)

        def _local(q, k, v):
            from ..parallel.mesh import _BATCH_CTX

            token = _BATCH_CTX.set(None)  # local trace: plain kernel path
            try:
                return flash_attention(q, k, v, scale)
            finally:
                _BATCH_CTX.reset(token)

        return shard_map(_local, mesh=mesh, in_specs=(spec,) * 3,
                         out_specs=spec, check_vma=False)(q, k, v)

    pallas_flash, BlockSizes = _get_kernel()
    sm_scale = float(scale) if scale is not None else D**-0.5

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # forward: 1024-blocks ~10% faster than 512 at the UNet's stage-0 shape
    # (B8 S4096 D40: 3.83 vs 4.27 ms; scripts/bench_attn2.py, interleaved
    # min). backward: keep 512 — the dkv/dq kernels carry more live VMEM
    # per block and regressed at 1024 (round-2 train-step measurement).
    # The stock kernel asserts seq_len % block == 0 for every block except
    # block_q, so pick the largest divisor (Sk=1536/2560/3584 would reject
    # a blind 1024).
    def _divisor_block(limit, seq):
        for cand in (limit, 512, 256, 128):
            if cand <= limit and seq % cand == 0:
                return cand
        return 128

    block_q = min(1024, Sq)
    block_k = _divisor_block(1024, Sk)
    bq_bwd = _divisor_block(512, Sq)
    bk_bwd = _divisor_block(512, Sk)
    bs = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
        block_q_major_dkv=bq_bwd,
        block_k_major_dkv=bk_bwd,
        block_k_dkv=bk_bwd,
        block_q_dkv=bq_bwd,
        block_k_major_dq=bk_bwd,
        block_k_dq=bk_bwd,
        block_q_dq=bq_bwd,
    )
    out = pallas_flash(qt, kt, vt, causal=False, sm_scale=sm_scale, block_sizes=bs)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
