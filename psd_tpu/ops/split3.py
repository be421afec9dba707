"""Fused triple-pathway split-injection cross-attention (Pallas TPU kernel).

The reference computes the three pathways as 2–3 SEPARATE full attention
passes per cross-attention site (attention_processor_routing_gates.py:
148-178). Each pathway's KV length is tiny (16 tokens), so the natural TPU
kernel (SURVEY.md §7 "hard parts") reads the query block ONCE from HBM,
keeps all three K/V banks resident in VMEM, computes the three small
softmax attentions on the MXU, and writes the gated combination:

    out = g_anat·softmax(qKaᵀ/√d)Va + g_dis·softmax(qKdᵀ/√d)Vd
        + δ·softmax(qKδᵀ/√d)Vδ

with the gates static per site and δ (delta_scale) a traced scalar in SMEM.
Falls back to the XLA path off-TPU (the caller handles that); `interpret=`
mode makes the kernel CPU-testable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ds_ref, q_ref, ka_ref, va_ref, kd_ref, vd_ref, kl_ref, vl_ref,
            o_ref, *, scale: float, anat_gate: float, dis_gate: float):
    # Input-dtype matmuls with fp32 accumulation (bf16 in the model — fp32
    # MXU contractions cost multiple passes per tile for no accuracy the
    # bf16 pipeline keeps anyway; CPU tests feed fp32 and stay exact).
    # The softmax scale folds into q (with log2e so the exponentials run as
    # raw exp2): a (block_q, D) multiply instead of three (block_q, KV)-sized
    # logit scalings.
    LOG2E = 1.4426950408889634
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)  # (block_q, D)

    def att(k_ref, v_ref):
        k = k_ref[0]  # (KV, D)
        v = v_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, KV) fp32, log2 units
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    out = anat_gate * att(ka_ref, va_ref) + dis_gate * att(kd_ref, vd_ref)
    out = out + ds_ref[0] * att(kl_ref, vl_ref)
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_split3(q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta,
                delta_scale, anat_gate, dis_gate, scale):
    """Reference math in plain jnp — used for the backward pass (the KV
    banks are 16 tokens, so recomputation is negligible) and as the
    off-TPU fallback in tests."""
    from .attention import dot_product_attention

    z = anat_gate * dot_product_attention(q, k_anat, v_anat, scale=scale)
    z = z + dis_gate * dot_product_attention(q, k_dis, v_dis, scale=scale)
    z = z + delta_scale.astype(z.dtype) * dot_product_attention(
        q, k_delta, v_delta, scale=scale
    )
    return z


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def split3_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k_anat: jnp.ndarray,  # (B, Ka, H, D)
    v_anat: jnp.ndarray,
    k_dis: jnp.ndarray,  # (B, Kd, H, D)
    v_dis: jnp.ndarray,
    k_delta: jnp.ndarray,  # (B, Kl, H, D)
    v_delta: jnp.ndarray,
    delta_scale: jnp.ndarray,  # scalar
    anat_gate: float = 0.5,
    dis_gate: float = 0.5,
    scale: Optional[float] = None,
    block_q: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused gated triple attention; output (B, S, H, D) in q.dtype."""
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    B, S, H, D = q.shape
    scale = scale if scale is not None else D**-0.5
    block_q = min(block_q, S)
    assert S % block_q == 0, (S, block_q)

    # fold heads into the grid: operate on (B*H, S, D)
    def fold(t):
        return t.transpose(0, 2, 1, 3).reshape(B * H, t.shape[1], D)

    qf = fold(q)
    banks = [fold(t) for t in (k_anat, v_anat, k_dis, v_dis, k_delta, v_delta)]

    grid = (B * H, S // block_q)
    # KV banks are tiny → they live fully in VMEM blocks
    def kv_block(t):
        return pl.BlockSpec((1, t.shape[1], D), lambda bh, i: (bh, 0, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, anat_gate=anat_gate, dis_gate=dis_gate
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # delta_scale (1,)
            pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
            kv_block(banks[0]),
            kv_block(banks[1]),
            kv_block(banks[2]),
            kv_block(banks[3]),
            kv_block(banks[4]),
            kv_block(banks[5]),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(delta_scale, jnp.float32).reshape(1), qf, *banks)

    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _split3_fwd(q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta,
                delta_scale, anat_gate, dis_gate, scale, block_q, interpret):
    out = split3_attention(
        q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta, delta_scale,
        anat_gate, dis_gate, scale, block_q, interpret,
    )
    residuals = (q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta, delta_scale)
    return out, residuals


def _split3_bwd(anat_gate, dis_gate, scale, block_q, interpret, residuals, g):
    """Backward via the XLA-math reference: KV length is 16 per bank, so
    recomputing the three small attentions costs ~nothing relative to the
    surrounding UNet backward."""
    def ref(*args):
        return _xla_split3(*args, anat_gate, dis_gate, scale)

    _, vjp_fn = jax.vjp(ref, *residuals)
    return vjp_fn(g)


split3_attention.defvjp(_split3_fwd, _split3_bwd)


def split3_attention_sharded(
    q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta, delta_scale,
    anat_gate: float = 0.5, dis_gate: float = 0.5,
    scale: Optional[float] = None, block_q: int = 512,
    interpret: Optional[bool] = None,
):
    """Mesh-composing entry: under an active >1-device batch scope, runs the
    kernel inside shard_map over the batch axes (+ head axis under tp), so
    GSPMD never sees the unpartitionable Mosaic custom call. Returns None
    when the local batch cannot be formed (caller takes the XLA fallback);
    identical to split3_attention otherwise."""
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    args = (q, k_anat, v_anat, k_dis, v_dis, k_delta, v_delta)
    if info is None:
        return split3_attention(*args, delta_scale, anat_gate, dis_gate,
                                scale, block_q, interpret)
    mesh, axes, n = info
    B, _, H, _ = q.shape
    if B % n:
        return None
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("tp", 1)
    h_ax = "tp" if (tp > 1 and H % tp == 0) else None
    spec = P(axes, None, h_ax, None)

    def _run(*a):
        return split3_attention(*a[:-1], a[-1], anat_gate, dis_gate,
                                scale, block_q, interpret)

    return shard_map(
        _run, mesh=mesh, in_specs=(spec,) * 7 + (P(),),
        out_specs=spec, check_vma=False,
    )(*args, jnp.asarray(delta_scale, jnp.float32))
