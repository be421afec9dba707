"""Fused nearest-2× upsample + 3×3 conv.

`conv3x3(nearest_up2(x))` recomputes every kernel tap against duplicated
pixels: output pixel (2i+a, 2j+b) only ever sees input rows {i-1, i} (a=0)
or {i, i+1} (a=1) — the 3×3 window over the upsampled grid collapses to a
2×2 window over the ORIGINAL grid with phase-dependent tap sums. Computing
the four (a, b) phases as four 2×2 convolutions and interleaving:

  * 16 MXU taps instead of 36 (2.25× fewer FLOPs), and
  * the 4×-sized upsampled intermediate never exists in HBM.

Used by Upsample2D in the SD UNet up path and the VAE decoder (the
reference runs F.interpolate + Conv2d via diffusers' Upsample2D; this is
the TPU-native equivalent). Exact to the reference math — phase kernels
are tap-sums of the original 3×3 kernel, verified in tests/test_upconv.py.

Phase tap grouping (row direction; columns identical with b):
  a=0: upsampled rows 2i-1, 2i, 2i+1 → input rows [i-1], [i, i]
       → 2×2 kernel rows [K0, K1+K2], window rows (i-1, i), pad top
  a=1: rows 2i, 2i+1, 2i+2 → input rows [i, i], [i+1]
       → kernel rows [K0+K1, K2], window rows (i, i+1), pad bottom
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _phase_kernel(k: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """2×2 phase kernel from a 3×3 kernel (HWIO) by tap-sums."""
    if a == 0:
        rows = (k[0:1], k[1:2] + k[2:3])  # rows [i-1], [i]
    else:
        rows = (k[0:1] + k[1:2], k[2:3])  # rows [i], [i+1]
    kr = jnp.concatenate(rows, axis=0)  # (2, 3, I, O)
    if b == 0:
        cols = (kr[:, 0:1], kr[:, 1:2] + kr[:, 2:3])
    else:
        cols = (kr[:, 0:1] + kr[:, 1:2], kr[:, 2:3])
    return jnp.concatenate(cols, axis=1)  # (2, 2, I, O)


def upsample2x_conv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    kernel: jnp.ndarray,  # (3, 3, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """= conv3x3_SAME(nearest_up2(x), kernel) + bias, shape (B,2H,2W,Cout)."""
    dtype = dtype or x.dtype
    B, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    xd = x.astype(dtype)
    dn = ("NHWC", "HWIO", "NHWC")

    phases = []
    for a in (0, 1):
        for b in (0, 1):
            # tap-sums in fp32 so K1+K2 carries no extra bf16 rounding the
            # unfused conv (9 taps, one fp32 accumulator) would not have
            pk = _phase_kernel(kernel.astype(jnp.float32), a, b).astype(dtype)
            pad_r = (1, 0) if a == 0 else (0, 1)
            pad_c = (1, 0) if b == 0 else (0, 1)
            # no preferred_element_type: the conv transpose rule rejects the
            # mixed-dtype cotangent it induces; TPU bf16 convs accumulate
            # fp32 on the MXU regardless
            y = jax.lax.conv_general_dilated(
                xd, pk, (1, 1), (pad_r, pad_c),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, pk.shape, dn
                ),
            )
            phases.append(y)  # (B, H, W, Co) in compute dtype

    # interleave: out[2i+a, 2j+b] = phases[2a+b][i, j]
    y = jnp.stack(phases, axis=3).reshape(B, H, W, 2, 2, Co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, Co)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32))
    return y.astype(dtype)


def upsample2x_conv3x3_reference(x, kernel, bias=None, dtype=None):
    """Unfused reference: broadcast nearest-up2 then SAME conv (test oracle)."""
    dtype = dtype or x.dtype
    b, h, w, c = x.shape
    up = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, h * 2, w * 2, c)
    dn = jax.lax.conv_dimension_numbers(up.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        up.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
