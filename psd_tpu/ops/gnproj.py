"""Fused (folded GroupNorm affine) → projection Pallas kernel.

Every transformer site opens with `proj_in(GN(x))` (Transformer2D; the
reference reaches this through diffusers' Transformer2DModel at
src/models/attention_processor_routing_gates.py call sites). GroupNorm
statistics span the whole (H·W, C/G) plane, so unlike LayerNorm they cannot
be computed per row-block — but the statistics REDUCE to a per-(batch,
channel) affine (w, b) (ops/norms.py group_norm_fold, one lane-aligned
stats pass). Given that affine, the normalize pass and the C→C projection
fuse into one kernel: x is read once, the normalized tensor never touches
HBM, and the matmul output is the only write.

XLA sequence:   stats read → normalize (r+w) → proj (r+w)   = 3R + 2W
fused:          stats read → gn_proj (r+w)                  = 2R + 1W

Same numerics class as the rest of the model: bf16 operands, fp32
accumulation, the affine applied in fp32 before the cast into the matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_reference(x, w, b, ws, bs):
    """(B,S,C), (B,C) affine, per-output (C,N_i)/(N_i,) weights."""
    xa = x.astype(jnp.float32) * w[:, None, :] + b[:, None, :]
    xa = xa.astype(x.dtype)
    outs = []
    for wi, bi in zip(ws, bs):
        o = jnp.dot(xa, wi.astype(x.dtype), preferred_element_type=jnp.float32)
        if bi is not None:
            o = o + bi.astype(jnp.float32)
        outs.append(o.astype(x.dtype))
    return tuple(outs)


def _kernel(x_ref, w_ref, b_ref, *rest, n_out, has_bias):
    w_refs = rest[:n_out]
    b_refs = rest[n_out : n_out + sum(has_bias)]
    o_refs = rest[n_out + sum(has_bias):]
    x = x_ref[0].astype(jnp.float32)  # (BM, C)
    xa = x * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    xa = xa.astype(o_refs[0].dtype)
    bi_iter = iter(b_refs)
    for i, (w_r, o_r) in enumerate(zip(w_refs, o_refs)):
        o = jnp.dot(xa, w_r[...], preferred_element_type=jnp.float32)
        if has_bias[i]:
            o = o + next(bi_iter)[...].astype(jnp.float32)
        o_r[0] = o.astype(o_r.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gn_proj(
    x: jnp.ndarray,  # (B, S, C)
    w: jnp.ndarray,  # (B, C) fp32 — folded GN scale (group_norm_fold)
    b: jnp.ndarray,  # (B, C) fp32 — folded GN shift
    ws: tuple,  # tuple of (C, N_i) projection weights
    bs: tuple,  # tuple of (N_i,) biases or None, same length as ws
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> tuple:
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    B, S, C = x.shape
    BM = min(block_m, S)
    assert S % BM == 0, (S, BM)
    n_out = len(ws)
    has_bias = tuple(bi is not None for bi in bs)
    wdt = x.dtype
    real_bs = [bi for bi in bs if bi is not None]

    wbytes = sum(C * wi.shape[1] for wi in ws) * 2
    out = pl.pallas_call(
        functools.partial(_kernel, n_out=n_out, has_bias=has_bias),
        grid=(B, S // BM),
        in_specs=[
            pl.BlockSpec((1, BM, C), lambda bi, si: (bi, si, 0)),
            # per-batch affine as (B, 1, C): Mosaic requires the last-two
            # block dims divisible by (8, 128) or equal to the array dims —
            # a (1, C) block over (B, C) violates the sublane rule
            pl.BlockSpec((1, 1, C), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda bi, si: (bi, 0, 0)),
        ]
        + [pl.BlockSpec((C, wi.shape[1]), lambda bi, si: (0, 0)) for wi in ws]
        + [
            pl.BlockSpec((1, bi.shape[0]), lambda bi_, si: (0, 0))
            for bi in real_bs
        ],
        out_specs=tuple(
            pl.BlockSpec((1, BM, wi.shape[1]), lambda bi, si: (bi, si, 0))
            for wi in ws
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, S, wi.shape[1]), x.dtype) for wi in ws
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(
                2 * wbytes
                + 4 * BM * C * 2
                + 4 * sum(BM * wi.shape[1] for wi in ws) * 2
                + BM * C * 4 * 2
                + (1 << 22)
            ),
        ),
    )(
        x,
        w.reshape(B, 1, C).astype(jnp.float32),
        b.reshape(B, 1, C).astype(jnp.float32),
        *[wi.astype(wdt) for wi in ws],
        *[bi.reshape(1, -1).astype(jnp.float32) for bi in real_bs],
    )
    return out


def _fwd(x, w, b, ws, bs, block_m, interpret):
    return gn_proj(x, w, b, ws, bs, block_m, interpret), (x, w, b, ws, bs)


def _bwd(block_m, interpret, residuals, g):
    x, w, b, ws, bs = residuals
    _, vjp_fn = jax.vjp(
        lambda x, w, b, ws: _xla_reference(
            x, w, b, ws, bs
        ),
        x, w, b, ws,
    )
    dx, dw, db, dws = vjp_fn(g)
    dbs = tuple(
        None if bi is None else gi.sum(axis=(0, 1)) for bi, gi in zip(bs, g)
    )
    return dx, dw, db, dws, dbs


gn_proj.defvjp(_fwd, _bwd)


def gn_proj_sharded(x, w, b, ws, bs, block_m: int = 512):
    """gn_proj composed with an active device mesh: batch-dim shards run the
    single-chip kernel under shard_map (same pattern as ops/geglu.py
    *_sharded). Identity composition when no mesh scope is active."""
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    if info is None:
        return gn_proj(x, w, b, ws, bs, block_m)
    mesh, axes, n = info
    if x.shape[0] % n:
        return None  # caller falls back to XLA reference math
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_out = len(ws)
    n_real_b = sum(bi is not None for bi in bs)

    def fn(xx, ww, bb, *rest):
        wss = rest[:n_out]
        rbs = rest[n_out:]
        it = iter(rbs)
        full_bs = tuple(
            next(it) if bi is not None else None for bi in bs
        )
        return tuple(gn_proj(xx, ww, bb, tuple(wss), full_bs, block_m))

    real_bs = [bi for bi in bs if bi is not None]
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes)) + (P(),) * (n_out + n_real_b),
        out_specs=tuple([P(axes)] * n_out), check_vma=False,
    )(x, w, b, *ws, *real_bs)
