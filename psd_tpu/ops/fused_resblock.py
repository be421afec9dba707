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
            sc_ref, o_ref, load_buf, act_buf, sem = rest
        else:
            o_ref, load_buf, act_buf, sem = rest
        bi = pl.program_id(0)
        r = pl.program_id(1)

        # load + activate the row slab once; reuse across cout blocks.
        # act_buf rows: [0]=top halo, [1..BR]=interior, [BR+1]=bottom halo.
        # Rolls (fp32 — Mosaic rotate needs 32-bit) replace all sublane/lane
        # slicing, which Mosaic's tiling constraints forbid.
        @pl.when(pl.program_id(2) == 0)
        def _load():
            H = n_row_blocks * BR
            win = min(BR + 2, H)
            lo = jnp.clip(r * BR - 1, 0, H - win)
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(lo, win), :, :],
                load_buf.at[pl.ds(0, win), :, :],
                sem.at[0],
            )
            dma.start()
            dma.wait()

            gw = gnw_ref[bi].astype(jnp.float32)
            gb = gnb_ref[bi].astype(jnp.float32)
            act = jax.nn.silu(load_buf[...].astype(jnp.float32) * gw + gb)
            # align interior rows to [1..BR]: circular roll by (1 − offset)
            shift = (1 - (r * BR - lo)) % (BR + 2)
            act = pltpu.roll(act, shift, 0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, W, 1), 0)
            valid = ((rows >= 1) | (r > 0)) & (
                (rows <= BR) | (r < n_row_blocks - 1)
            )
            act_buf[...] = jnp.where(valid, act, jnp.zeros_like(act))

        # 3×3 conv as 9 shifted matmuls on the MXU; dx shifts via roll with
        # edge-column masking (zero-padding semantics)
        in_dtype = o_ref.dtype
        cols = jax.lax.broadcasted_iota(jnp.int32, (BR, W, 1), 1)
        acc = jnp.zeros((BR * W, BC), jnp.float32)
        for dy in range(3):
            rows_slab = act_buf[pl.ds(dy, BR), :, :]
            for dx in range(3):
                if dx == 1:
                    patch = rows_slab
                elif dx == 0:
                    patch = pltpu.roll(rows_slab, 1, 1)
                    patch = jnp.where(cols >= 1, patch, jnp.zeros_like(patch))
                else:
                    patch = pltpu.roll(rows_slab, W - 1, 1)
                    patch = jnp.where(cols <= W - 2, patch,
                                      jnp.zeros_like(patch))
                acc = acc + jnp.dot(
                    patch.astype(in_dtype).reshape(BR * W, Cin),
                    w_ref[dy, dx, :, :],
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
    if Cin > 1280:
        BR = min(BR, 8)
    assert H % BR == 0, (H, BR)
    # largest divisor of Cout whose (3,3,Cin,BC) weight block fits the
    # VMEM budget
    budget = 6 * 1024 * 1024
    bc_max = max(budget // (9 * Cin * 2), 128)
    BC = Cout
    if Cout > 512 or 9 * Cin * Cout * 2 > budget:
        # partial channel blocks must be multiples of 128 (Mosaic tiling)
        for cand in (512, 384, 256, 128):
            if Cout % cand == 0 and cand <= bc_max:
                BC = cand
                break
        else:
            BC = Cout  # fall back to full (small Cout)
    assert Cout % BC == 0, (Cout, BC)
    n_row_blocks = H // BR
    has_shortcut = shortcut is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        pl.BlockSpec((B, Cin), lambda bi, r, c: (0, 0)),  # gn vectors: full
        pl.BlockSpec((B, Cin), lambda bi, r, c: (0, 0)),
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
            pltpu.VMEM((BR + 2, W_, Cin), x.dtype),
            pltpu.VMEM((BR + 2, W_, Cin), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
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
