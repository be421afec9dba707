"""Fused GroupNorm-apply → SiLU → 3×3 conv (→ +residual) Pallas kernel.

The resblock chain GN→SiLU→conv→(+res) costs several full HBM round trips
as separate XLA fusions (docs/perf_notes.md: elementwise ≈ 36% of the UNet
step on this chip). This kernel reads the input slab ONCE per (batch,
row-block) and keeps it VMEM-resident across output-channel blocks: the
pre-folded GroupNorm affine (ops.norms.group_norm_fold) and SiLU are
applied in VMEM, the 3×3 conv runs as 9 shifted matmuls on the MXU, and
the residual is added in the epilogue before the single output write.

Halo rows are DMA'd manually (BlockSpecs cannot overlap); the column halo
lives in a zero-initialized VMEM scratch. Backward = custom VJP over the
XLA reference math (like ops.split3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_reference(x, gn_w, gn_b, w, b, shortcut):
    """Same math in plain jnp (backward pass + CPU fallback)."""
    xn = x.astype(jnp.float32) * gn_w[:, None, None, :] + gn_b[:, None, None, :]
    xn = jax.nn.silu(xn).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xn, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)
    if shortcut is not None:
        out = out + shortcut.astype(jnp.float32)
    return out.astype(x.dtype)


def _make_kernel(BR, W, Cin, BC, n_row_blocks, has_shortcut):
    def kernel(x_hbm, gnw_ref, gnb_ref, w_ref, b_ref, *rest):
        if has_shortcut:
            sc_ref, o_ref, xbuf, sem = rest
        else:
            o_ref, xbuf, sem = rest
        bi = pl.program_id(0)
        r = pl.program_id(1)

        # load + activate the row slab once; reuse across cout blocks
        @pl.when(pl.program_id(2) == 0)
        def _load():
            xbuf[...] = jnp.zeros_like(xbuf)
            main = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(r * BR, BR), :, :],
                xbuf.at[pl.ds(1, BR), pl.ds(1, W), :],
                sem.at[0],
            )
            main.start()

            @pl.when(r > 0)
            def _top():
                top = pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(r * BR - 1, 1), :, :],
                    xbuf.at[pl.ds(0, 1), pl.ds(1, W), :],
                    sem.at[1],
                )
                top.start()
                top.wait()

            @pl.when(r < n_row_blocks - 1)
            def _bot():
                bot = pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds((r + 1) * BR, 1), :, :],
                    xbuf.at[pl.ds(BR + 1, 1), pl.ds(1, W), :],
                    sem.at[2],
                )
                bot.start()
                bot.wait()

            main.wait()
            gw = gnw_ref[0].astype(jnp.float32)
            gb = gnb_ref[0].astype(jnp.float32)
            act = jax.nn.silu(
                xbuf[...].astype(jnp.float32) * gw + gb
            ).astype(xbuf.dtype)
            # conv zero-padding: halo cells outside the image must stay 0
            rows = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, W + 2, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, W + 2, 1), 1)
            valid = (cols >= 1) & (cols <= W)
            valid &= (rows >= 1) | (r > 0)
            valid &= (rows <= BR) | (r < n_row_blocks - 1)
            xbuf[...] = jnp.where(valid, act, jnp.zeros_like(act))

        # 3×3 conv as 9 shifted matmuls on the MXU
        acc = jnp.zeros((BR * W, BC), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xbuf[pl.ds(dy, BR), pl.ds(dx, W), :].reshape(
                    BR * W, Cin
                )
                acc = acc + jnp.dot(
                    patch, w_ref[dy, dx, :, :],
                    preferred_element_type=jnp.float32,
                )
        acc = acc + b_ref[...].astype(jnp.float32)
        if has_shortcut:
            acc = acc + sc_ref[0].reshape(BR * W, BC).astype(jnp.float32)
        o_ref[0] = acc.reshape(BR, W, BC).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_gn_silu_conv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    gn_w: jnp.ndarray,  # (B, Cin) fp32 folded GN scale
    gn_b: jnp.ndarray,  # (B, Cin) fp32 folded GN bias
    w: jnp.ndarray,  # (3, 3, Cin, Cout)
    b: jnp.ndarray,  # (Cout,)
    shortcut: Optional[jnp.ndarray],  # (B, H, W, Cout) or None
    block_rows: int = 16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    B, H, W_, Cin = x.shape
    Cout = w.shape[-1]
    BR = min(block_rows, H)
    assert H % BR == 0, (H, BR)
    BC = Cout if Cout <= 512 else 256
    assert Cout % BC == 0, (Cout, BC)
    n_row_blocks = H // BR
    has_shortcut = shortcut is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        pl.BlockSpec((1, Cin), lambda bi, r, c: (bi, 0)),
        pl.BlockSpec((1, Cin), lambda bi, r, c: (bi, 0)),
        pl.BlockSpec((3, 3, Cin, BC), lambda bi, r, c: (0, 0, 0, c)),
        pl.BlockSpec((1, BC), lambda bi, r, c: (0, c)),
    ]
    args = [x, gn_w, gn_b, w.astype(x.dtype), b.reshape(1, Cout)]
    if has_shortcut:
        in_specs.append(
            pl.BlockSpec((1, BR, W_, BC), lambda bi, r, c: (bi, r, 0, c))
        )
        args.append(shortcut)

    kernel = _make_kernel(BR, W_, Cin, BC, n_row_blocks, has_shortcut)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_row_blocks, Cout // BC),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BR, W_, BC), lambda bi, r, c: (bi, r, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W_, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BR + 2, W_ + 2, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(*args)
    return out


def _fwd(x, gn_w, gn_b, w, b, shortcut, block_rows, interpret):
    out = fused_gn_silu_conv3x3(x, gn_w, gn_b, w, b, shortcut,
                                block_rows, interpret)
    return out, (x, gn_w, gn_b, w, b, shortcut)


def _bwd(block_rows, interpret, residuals, g):
    x, gn_w, gn_b, w, b, shortcut = residuals
    if shortcut is None:
        def ref(x, gn_w, gn_b, w, b):
            return _xla_reference(x, gn_w, gn_b, w, b, None)

        _, vjp_fn = jax.vjp(ref, x, gn_w, gn_b, w, b)
        return vjp_fn(g) + (None,)
    _, vjp_fn = jax.vjp(_xla_reference, x, gn_w, gn_b, w, b, shortcut)
    return vjp_fn(g)


fused_gn_silu_conv3x3.defvjp(_fwd, _bwd)
