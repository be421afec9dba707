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


def _make_kernel(BR, W, Cin, BC, n_row_blocks, has_shortcut,
                 weight_resident):
    def kernel(x_hbm, gnw_ref, gnb_ref, w_ref, b_ref, *rest):
        if has_shortcut:
            sc_ref, o_ref, load_buf, act_buf, sem = rest
        else:
            o_ref, load_buf, act_buf, sem = rest
        if weight_resident:
            # grid (c, b, r): the weight block (indexed by c alone) stays
            # VMEM-resident across all (b, r) — total weight traffic is one
            # pass instead of one per row slab; the x slab re-loads per c.
            bi = pl.program_id(1)
            r = pl.program_id(2)
            load_now = True
        else:
            # grid (b, r, c): the x slab loads once per (b, r) and is
            # reused across cout blocks (weights stream per slab — only
            # sensible when Cout//BC == 1, where Pallas elides the
            # unchanged-index weight refetch entirely).
            bi = pl.program_id(0)
            r = pl.program_id(1)
            load_now = pl.program_id(2) == 0

        # load + activate the row slab; reuse across cout blocks.
        # act_buf rows: [0]=top halo, [1..BR]=interior, [BR+1]=bottom halo.
        # Rolls (fp32 — Mosaic rotate needs 32-bit) replace all sublane/lane
        # slicing, which Mosaic's tiling constraints forbid.
        @pl.when(load_now)
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
    has_shortcut = shortcut is not None

    # --- block sizing under a VMEM budget --------------------------------
    # weight block ≤ wbudget; then the largest row-slab (BR) whose combined
    # buffers (load bf16 + act fp32 + double-buffered weight/out/shortcut)
    # fit TOTAL_BUDGET. Partial channel blocks must be ×128 (Mosaic tiling).
    wbudget = 6 * 1024 * 1024
    BC = Cout
    if Cout > 512 or 9 * Cin * Cout * 2 > wbudget:
        bc_max = max(wbudget // (9 * Cin * 2), 128)
        for cand in (512, 384, 256, 128):
            if Cout % cand == 0 and cand <= bc_max:
                BC = cand
                break
        else:
            BC = Cout
    assert Cout % BC == 0, (Cout, BC)

    TOTAL_BUDGET = 12 * 1024 * 1024
    BR = None
    # wide rows: BR=16 at W=512 fails Mosaic compilation (measured on v5e;
    # BR≤8 compiles and validates at every W≥256 decoder shape)
    br_cap = 8 if W_ >= 256 else min(block_rows, H)
    for cand in (br_cap, 16, 8, 4):
        if cand > H or H % cand or cand > br_cap:
            continue
        est = (
            (cand + 2) * W_ * Cin * (4 + 2)        # act fp32 + load bf16
            + 9 * Cin * BC * 2 * 2                 # weight block (dbl-buf)
            + cand * W_ * BC * 2 * 2               # out block (dbl-buf)
            + (cand * W_ * BC * 2 * 2 if has_shortcut else 0)
        )
        if est <= TOTAL_BUDGET:
            BR = cand
            break
    if BR is None:
        # no legal tiling fits VMEM at this shape — XLA reference path
        return _xla_reference(x, gn_w, gn_b, w, b, shortcut)
    n_row_blocks = H // BR
    # multi-block Cout → keep the weight block resident (c outermost) and
    # re-stream the x slab per c; single-block Cout → slab-resident order
    # (Pallas elides the unchanged-index weight refetch).
    weight_resident = (Cout // BC) > 1

    if weight_resident:
        w_idx = lambda c, bi, r: (0, 0, 0, c)  # noqa: E731
        b_idx = lambda c, bi, r: (0, c)  # noqa: E731
        sc_idx = lambda c, bi, r: (bi, r, 0, c)  # noqa: E731
        gn_idx = lambda c, bi, r: (0, 0)  # noqa: E731
        grid = (Cout // BC, B, n_row_blocks)
    else:
        w_idx = lambda bi, r, c: (0, 0, 0, c)  # noqa: E731
        b_idx = lambda bi, r, c: (0, c)  # noqa: E731
        sc_idx = lambda bi, r, c: (bi, r, 0, c)  # noqa: E731
        gn_idx = lambda bi, r, c: (0, 0)  # noqa: E731
        grid = (B, n_row_blocks, Cout // BC)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        pl.BlockSpec((B, Cin), gn_idx),  # gn vectors: full
        pl.BlockSpec((B, Cin), gn_idx),
        pl.BlockSpec((3, 3, Cin, BC), w_idx),
        pl.BlockSpec((1, BC), b_idx),
    ]
    args = [x, gn_w, gn_b, w.astype(x.dtype), b.reshape(1, Cout)]
    if has_shortcut:
        in_specs.append(pl.BlockSpec((1, BR, W_, BC), sc_idx))
        args.append(shortcut)

    kernel = _make_kernel(BR, W_, Cin, BC, n_row_blocks, has_shortcut,
                          weight_resident)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BR, W_, BC), sc_idx),
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


def fused_gn_silu_conv3x3_sharded(x, gn_w, gn_b, w, b, shortcut,
                                  block_rows: int = 16):
    """Mesh-composing entry: shard_maps the kernel over the active batch
    axes (gn_w/gn_b are per-batch folded affines and shard with x). Falls
    back to plain invocation when no >1-device scope is active; returns
    None when the local batch cannot be formed."""
    from ..parallel.mesh import kernel_batch_axes

    info = kernel_batch_axes()
    if info is None:
        return fused_gn_silu_conv3x3(x, gn_w, gn_b, w, b, shortcut,
                                     block_rows)
    mesh, axes, n = info
    if x.shape[0] % n:
        return None
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bspec = P(axes, None, None, None)
    vspec = P(axes, None)
    if shortcut is None:
        fn = lambda xx, gw, gb, ww, bb: fused_gn_silu_conv3x3(  # noqa: E731
            xx, gw, gb, ww, bb, None, block_rows)
        return shard_map(fn, mesh=mesh,
                         in_specs=(bspec, vspec, vspec, P(), P()),
                         out_specs=bspec, check_vma=False)(x, gn_w, gn_b, w, b)
    fn = lambda xx, gw, gb, ww, bb, sc: fused_gn_silu_conv3x3(  # noqa: E731
        xx, gw, gb, ww, bb, sc, block_rows)
    return shard_map(fn, mesh=mesh,
                     in_specs=(bspec, vspec, vspec, P(), P(), bspec),
                     out_specs=bspec, check_vma=False)(
        x, gn_w, gn_b, w, b, shortcut)
