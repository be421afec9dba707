"""Single-pass spatial attention kernel for the UNet's self-attention.

The UNet's spatial sequences are short enough (≤4096 tokens at 512²
latents) that a full logit row fits in VMEM, so the online-softmax
machinery of the generic flash kernel (running max/sum, per-block
rescaling) is pure overhead: this kernel loads K/V for the whole sequence
once per (batch·head), computes one exact fp32 softmax per query block,
and writes the output — no rescale passes, no m/l bookkeeping, no extra
HBM round trips.

Replaces the reference's F.scaled_dot_product_attention CUDA path for the
SD UNet self-attention sites (diffusers AttnProcessor2_0, used via
attention_processor_base.py:197 / attention_processor_routing_gates.py:286).

VMEM at the worst shape (S=4096, D=40→128 lanes, BQ=256):
K/V 2×1 MB + logits fp32 4 MB + probs 2 MB + q/out ≈ 7.5 MB — fits with
double buffering. Backward: custom VJP that recomputes through the stock
flash kernel's VJP (both paths compute the same function; the fused
backward kernels there are already efficient).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LOG2E = 1.4426950408889634  # log2(e)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, D):
    """VPU budget is the limiter at S=4096 (the MXU work is ~2.8 ms/site but
    ~5 elementwise passes over the S² logits cost more) — so every S²-sized
    VPU op matters:
      * the softmax scale is folded into q (a (BQ,D) multiply, 1/S the work
        of scaling the logits) — WITH log2(e) folded in too, so the softmax
        exponentials run as raw exp2: exp(x−m) = exp2(x·log2e − m·log2e),
        and the per-element ·log2e multiply inside exp's lowering vanishes
        (the max is taken over the log2-scaled logits — same stability);
      * the softmax denominator comes out of the MXU for free: v carries an
        appended ones-column (D→D+1 pads into the same 128-lane tile), so
        PV's last column IS Σp — no S²-wide VPU sum-reduce pass. Numerator
        and denominator then use the SAME bf16-rounded p, making the output
        an exact convex combination of v rows."""
    q = q_ref[0] * (scale * LOG2E)  # (BQ, D) — fold scale+log2e pre-contraction
    k = k_ref[0]  # (S, D)
    v = v_ref[0]  # (S, D+1), last column ones
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, S) — in log2 units
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m).astype(v.dtype)
    z = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D+1); z[:, D] = Σp
    l = z[:, D : D + 1]  # static slice (Pallas TPU lowers slice, not dynamic_slice)
    o_ref[0] = (z[:, :D] / l).astype(o_ref.dtype)


def _kernel_q8(q_ref, sq_ref, k_ref, sk_ref, v_ref, sv_ref, o_ref, *,
               scale, pv8):
    """int8 QK^T (and optionally int8 PV) variant.

    Dequant is exact per element: logits[i,j] = acc[i,j]·sq[i]·sk[j]·scale
    (row scales are outside the contraction). For PV the probs are
    normalized first so each row's max is pmax/l, then quantized per-row —
    diffuse attention rows keep ~0.4% relative resolution instead of
    underflowing to zero."""
    q = q_ref[0]  # (BQ, D) int8
    k = k_ref[0]  # (S, D) int8
    acc = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (BQ, S)
    sq = sq_ref[0]  # (BQ, 1)
    sk = sk_ref[0]  # (1, S)
    # log2e folds into the row dequant scale → raw exp2 exponentials
    logits = acc.astype(jnp.float32) * (sq * (scale * LOG2E)) * sk
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if pv8:
        v = v_ref[0]  # (S, D) int8
        sv = sv_ref[0]  # (1, D)
        pn = p / l
        pmax = jnp.max(pn, axis=-1, keepdims=True)
        ps = jnp.maximum(pmax, 1e-20) * (1.0 / 127.0)
        pq = jnp.round(pn / ps).astype(jnp.int8)
        zi = jax.lax.dot_general(
            pq, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        z = zi.astype(jnp.float32) * ps * sv
        o_ref[0] = z.astype(o_ref.dtype)
    else:
        v = v_ref[0]  # (S, D) bf16
        z = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (z / l).astype(o_ref.dtype)


def _spattn_q8_impl(q, k, v, scale, block_q, pv8, interpret):
    """q, k, v: (BH, S, D) bf16 — quantized here at XLA level (fused cheap
    passes), int8 MXU contractions inside the kernel."""
    from .quant import quant_rows

    BH, S, D = q.shape
    BQ = min(block_q, S)
    assert S % BQ == 0
    qq, sq = quant_rows(q)  # (BH,S,D) int8, (BH,S,1)
    kq, sk = quant_rows(k)
    sk2 = sk.reshape(BH, 1, S)  # row vector per bh (Mosaic-legal block)
    if pv8:
        vf = v.astype(jnp.float32)
        vmax = jnp.max(jnp.abs(vf), axis=1, keepdims=True)  # (BH,1,D)
        sv = jnp.maximum(vmax, 1e-8) * (1.0 / 127.0)
        vq = jnp.round(vf / sv).astype(jnp.int8)
        sv2 = sv
    else:
        vq = v
        sv2 = jnp.ones((BH, 1, D), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel_q8, scale=scale, pv8=pv8),
        grid=(BH, S // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, BQ, 1), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, S, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda b, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(qq, sq, kq, sk2, vq, sv2)
    return out


def _spattn_fwd_impl(q, k, v, scale, block_q, interpret):
    BH, S, D = q.shape
    BQ = min(block_q, S)
    assert S % BQ == 0
    # ones-column appended to v: the PV matmul then emits the softmax
    # denominator as its last output column (see _kernel). D→D+1 stays
    # inside the same 128-lane tile, so the MXU cost is unchanged.
    v_ext = jnp.concatenate(
        [v, jnp.ones((BH, S, 1), v.dtype)], axis=-1
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, D=D),
        grid=(BH, S // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, S, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, S, D + 1), lambda b, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(q, k, v_ext)
    return out


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum(
        "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spattn(q, k, v, scale, block_q, interpret):
    return _spattn_fwd_impl(q, k, v, scale, block_q, interpret)


def _fwd(q, k, v, scale, block_q, interpret):
    return _spattn_fwd_impl(q, k, v, scale, block_q, interpret), (q, k, v)


def _bwd(scale, block_q, interpret, res, g):
    q, k, v = res
    # recompute-based backward through the generic flash VJP (fused Pallas
    # backward kernels); on CPU/interpret use the XLA reference math
    if interpret:
        _, vjp_fn = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, scale), q, k, v)
    else:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as pallas_flash,
        )

        def f(q, k, v):
            return pallas_flash(
                q[None], k[None], v[None], causal=False, sm_scale=scale
            )[0]

        _, vjp_fn = jax.vjp(f, q, k, v)
    return vjp_fn(g)


_spattn.defvjp(_fwd, _bwd)


def spatial_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, H, D)
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    quant: str = "none",  # "qk8" (int8 QK^T) | "int8" (QK^T + PV int8)
    interpret: Optional[bool] = None,
) -> Optional[jnp.ndarray]:
    """Single-pass attention; returns None when the caller should fall back
    (ragged shapes / sequence too long for whole-row VMEM residency).

    quant modes are inference-only (no VJP) and quality-gated in
    tests/test_spattn.py: exact per-row dequant ahead of the fp32 softmax
    keeps the logit error in the int8 rounding band (~0.4%)."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if Sq != Sk or Sq % 256 or Sq > 4096 or D > 256:
        return None
    if block_q is None:
        # 512 measured 5% faster than 256 at the S=4096/D=40 stage-0 shape
        # (fewer grid invocations); the (BQ, S) fp32 logits slab is the VMEM
        # limiter — stay at 256 for wide heads so 512·S·4B + K/V fits the
        # 16 MB scoped budget.
        block_q = 512 if D <= 64 else 256
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    if info is not None and B % info[2]:
        return None  # batch not divisible over the mesh → XLA fallback
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    sm_scale = float(scale) if scale is not None else D**-0.5

    def _run(q, k, v):
        Bl, Hl = q.shape[0], q.shape[2]
        qt = q.transpose(0, 2, 1, 3).reshape(Bl * Hl, Sq, D)
        kt = k.transpose(0, 2, 1, 3).reshape(Bl * Hl, Sk, D)
        vt = v.transpose(0, 2, 1, 3).reshape(Bl * Hl, Sk, D)
        if quant in ("qk8", "int8"):
            out = _spattn_q8_impl(qt, kt, vt, sm_scale, block_q,
                                  quant == "int8", interpret)
        else:
            out = _spattn(qt, kt, vt, sm_scale, block_q, interpret)
        return out.reshape(Bl, Hl, Sq, D).transpose(0, 2, 1, 3).astype(q.dtype)

    if info is not None:
        # batch-dim (and head-dim under tp) shard_map: each shard runs the
        # unmodified single-chip Mosaic program on its local (B/n, H/tp)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh, axes, _ = info
        tp = mesh.shape.get("tp", 1)
        h_ax = "tp" if (tp > 1 and H % tp == 0) else None
        spec = P(axes, None, h_ax, None)
        return shard_map(_run, mesh=mesh, in_specs=(spec,) * 3,
                         out_specs=spec, check_vma=False)(q, k, v)
    return _run(q, k, v)
