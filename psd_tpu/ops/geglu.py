"""Fused LayerNorm → GEGLU-projection Pallas kernel.

The transformer FF entry computes `[h|g] = LN(x) @ W0 + b0` (W0: C→8C)
followed by `h * gelu(g)`. As separate XLA ops this writes and re-reads the
8C-wide projection (the widest activation in the UNet: 168 MB per stage-0
site at batch 8) and runs LayerNorm as its own full pass. This kernel keeps
everything block-resident in VMEM:

    read x block once → per-row LN stats (fp32, flax fast-variance
    semantics) → two MXU matmuls against the [h|g] halves of W0 →
    h · gelu_exact(g) → single N-wide output write.

HBM traffic per site drops from read C + r/w C (LN) + write 8C + read 8C +
write 4C   to   read C + write 4C (plus weights once per N-block).

Replaces reference FF math at src/.../attention.py (diffusers GEGLU,
feed_forward) — semantics identical (erf gelu, fp32 LN stats, bf16 matmul
with fp32 accumulation). Backward = custom VJP over the XLA reference math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """erf via Abramowitz–Stegun 7.1.26 (|abs err| ≤ 1.5e-7 in fp32).

    Mosaic lowers neither erf nor erfc; exp is available. 1.5e-7 absolute
    error is ~4 orders below bf16 output rounding (~3e-3)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # erf-gelu (torch / jax approximate=False semantics), fp32
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0**-0.5)))


def ln_reference(x, scale, bias, eps=1e-5):
    """flax nn.LayerNorm math (fast variance, fp32 stats), output in x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _xla_reference(x, ln_scale, ln_bias, w0, b0, eps):
    """Same math in plain jnp: LN → proj → split → h·gelu(g)."""
    xn = ln_reference(x, ln_scale, ln_bias, eps)
    proj = (
        jnp.dot(xn, w0.astype(xn.dtype), preferred_element_type=jnp.float32)
        + b0.astype(jnp.float32)
    )
    h, g = jnp.split(proj, 2, axis=-1)
    return (h * _gelu_exact(g)).astype(x.dtype)


def _kernel(x_ref, s_ref, b_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (BM, C)
    C = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    xn = xn.astype(o_ref.dtype)

    h = (
        jnp.dot(xn, wh_ref[...], preferred_element_type=jnp.float32)
        + bh_ref[...].astype(jnp.float32)
    )
    g = (
        jnp.dot(xn, wg_ref[...], preferred_element_type=jnp.float32)
        + bg_ref[...].astype(jnp.float32)
    )
    o_ref[...] = (h * _gelu_exact(g)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_geglu(
    x: jnp.ndarray,  # (M, C) — caller flattens (B, S, C)
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,  # (C,)
    w0: jnp.ndarray,  # (C, 2N) — [h|g] halves
    b0: jnp.ndarray,  # (2N,)
    eps: float = 1e-5,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    M, C = x.shape
    N = w0.shape[1] // 2
    BM = min(block_m, M)
    assert M % BM == 0, (M, BM)
    # N blocks: weights (C, BN) must fit comfortably; 512 lanes works for all
    # UNet widths (C up to 1280 → 1.3 MB per half-block in bf16)
    BN = 512 if N % 512 == 0 else (256 if N % 256 == 0 else N)
    nj = N // BN

    wdt = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(M // BM, nj),
        in_specs=[
            pl.BlockSpec((BM, C), lambda i, j: (i, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
            pl.BlockSpec((C, BN), lambda i, j: (0, j)),
            pl.BlockSpec((C, BN), lambda i, j: (0, j + nj)),
            pl.BlockSpec((1, BN), lambda i, j: (0, j)),
            pl.BlockSpec((1, BN), lambda i, j: (0, j + nj)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        x,
        ln_scale.reshape(1, C),
        ln_bias.reshape(1, C),
        w0.astype(wdt),
        w0.astype(wdt),
        b0.reshape(1, 2 * N),
        b0.reshape(1, 2 * N),
    )
    return out


def _fwd(x, ln_scale, ln_bias, w0, b0, eps, block_m, interpret):
    out = ln_geglu(x, ln_scale, ln_bias, w0, b0, eps, block_m, interpret)
    return out, (x, ln_scale, ln_bias, w0, b0)


def _bwd(eps, block_m, interpret, residuals, g):
    x, ln_scale, ln_bias, w0, b0 = residuals
    _, vjp_fn = jax.vjp(
        lambda *a: _xla_reference(*a, eps), x, ln_scale, ln_bias, w0, b0
    )
    return vjp_fn(g)


ln_geglu.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# LN → N-way matmul (the attention sites' norm + q/k/v projections)
# ---------------------------------------------------------------------------

def _xla_ln_proj(x, ln_scale, ln_bias, ws, eps):
    xn = ln_reference(x, ln_scale, ln_bias, eps)
    return tuple(
        jnp.dot(xn, w.astype(xn.dtype), preferred_element_type=jnp.float32)
        .astype(x.dtype)
        for w in ws
    )


def _mm_kernel(x_ref, s_ref, b_ref, *rest, eps, n_out):
    w_refs = rest[:n_out]
    o_refs = rest[n_out:]
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    xn = xn.astype(o_refs[0].dtype)
    for w_ref, o_ref in zip(w_refs, o_refs):
        o_ref[...] = jnp.dot(
            xn, w_ref[...], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ln_proj(
    x: jnp.ndarray,  # (M, C)
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,  # (C,)
    ws: tuple,  # tuple of (C, N_i) projection weights (no bias — SD to_q/k/v)
    eps: float = 1e-5,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> tuple:
    """LayerNorm + several bias-free projections of the SAME input, fused:
    x is read once and normalized once per row-block instead of once per
    consumer. Used for the transformer sites' norm1+to_q/k/v (self-attn)
    and norm2+to_q (cross-attn)."""
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    M, C = x.shape
    BM = min(block_m, M)
    assert M % BM == 0, (M, BM)
    n_out = len(ws)
    wdt = x.dtype

    wbytes = sum(C * w.shape[1] for w in ws) * 2
    out = pl.pallas_call(
        functools.partial(_mm_kernel, eps=eps, n_out=n_out),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ]
        + [
            pl.BlockSpec((C, w.shape[1]), lambda i: (0, 0)) for w in ws
        ],
        out_specs=tuple(
            pl.BlockSpec((BM, w.shape[1]), lambda i: (i, 0)) for w in ws
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((M, w.shape[1]), x.dtype) for w in ws
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(
                2 * wbytes  # weight blocks (+double buffer)
                + 4 * BM * C * 2  # x block in/out buffers
                + 4 * sum(BM * w.shape[1] for w in ws) * 2
                + BM * C * 4 * 2  # fp32 LN temporaries
                + (1 << 22)
            ),
        ),
    )(
        x,
        ln_scale.reshape(1, C),
        ln_bias.reshape(1, C),
        *[w.astype(wdt) for w in ws],
    )
    return out


def _proj_fwd(x, ln_scale, ln_bias, ws, eps, block_m, interpret):
    out = ln_proj(x, ln_scale, ln_bias, ws, eps, block_m, interpret)
    return out, (x, ln_scale, ln_bias, ws)


def _proj_bwd(eps, block_m, interpret, residuals, g):
    x, ln_scale, ln_bias, ws = residuals
    _, vjp_fn = jax.vjp(
        lambda x, s, b, ws: _xla_ln_proj(x, s, b, ws, eps),
        x, ln_scale, ln_bias, ws,
    )
    return vjp_fn(g)


ln_proj.defvjp(_proj_fwd, _proj_bwd)


def _row_shard_map(fn, x, extras, out_specs_fn):
    """Run fn(x, *extras) under shard_map with x split on dim 0 over the
    active batch axes, extras replicated. Caller guarantees divisibility."""
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    if info is None:
        return fn(x, *extras)
    mesh, axes, _ = info
    from jax import shard_map

    return shard_map(
        fn, mesh=mesh,
        in_specs=(_P(axes),) + (_P(),) * len(extras),
        out_specs=out_specs_fn(axes), check_vma=False,
    )(x, *extras)


def _P(*a):
    from jax.sharding import PartitionSpec

    return PartitionSpec(*a)


def ln_geglu_sharded(x, ln_scale, ln_bias, w0, b0, eps: float = 1e-5,
                     block_m: int = 512):
    """ln_geglu composed with an active device mesh: the rows (flattened
    batch·seq, batch-major) shard over the batch axes and each shard runs
    the single-chip kernel. Identical to ln_geglu when no mesh scope is
    active."""
    return _row_shard_map(
        lambda xx, s, b, w, bb: ln_geglu(xx, s, b, w, bb, eps, block_m),
        x, (ln_scale, ln_bias, w0, b0), lambda axes: _P(axes))


def ln_proj_sharded(x, ln_scale, ln_bias, ws, eps: float = 1e-5,
                    block_m: int = 512):
    """ln_proj composed with an active device mesh (see ln_geglu_sharded)."""
    n = len(ws)
    return _row_shard_map(
        lambda xx, s, b, *w: tuple(ln_proj(xx, s, b, tuple(w), eps, block_m)),
        x, (ln_scale, ln_bias) + tuple(ws),
        lambda axes: tuple([_P(axes)] * n))
