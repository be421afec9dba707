"""TPU-friendly GroupNorm.

flax's nn.GroupNorm reduces over (H, W, C/G) directly; with NHWC and SD's
320/32 = 10 channels per group the group reduction is a 10-lane strided
access — profiled at ~22% of the UNet step. This implementation reduces
over (H, W) per channel (lane-aligned, one data pass for sum and sum-of-
squares), combines the per-channel moments into group moments on a (G,)
vector (trivial), and normalizes with per-channel broadcast vectors.
Numerically identical to nn.GroupNorm (same eps placement, fp32 stats).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def group_norm_fold(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    shift: jnp.ndarray | None = None,  # (B, C) virtual per-channel addition
):
    """Per-(batch, channel) affine fold of GroupNorm: returns (w, b) fp32
    (B, C) such that GN(x + shift)·scale+bias == x·w + b. One lane-aligned
    stats pass; `shift` folds the resblock's timestep-embedding addition
    analytically (s1' = s1 + n·t, s2' = s2 + 2·t·s1 + n·t²) so h+temb is
    never materialized. Used standalone and by the fused resblock kernel."""
    C = x.shape[-1]
    G = num_groups
    assert C % G == 0, (C, G)
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = x.size // x.shape[0] // C
    n_per_group = n_spatial * (C // G)

    s1 = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)  # (B, C)
    s2 = jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=spatial_axes
    )
    if shift is not None:
        t = shift.astype(jnp.float32)
        s2 = s2 + 2.0 * t * s1 + n_spatial * t * t
        s1 = s1 + n_spatial * t
    B = s1.shape[0]
    g1 = s1.reshape(B, G, C // G).sum(-1)
    g2 = s2.reshape(B, G, C // G).sum(-1)
    mean_g = g1 / n_per_group
    var_g = g2 / n_per_group - mean_g**2
    inv_g = jnp.reciprocal(jnp.sqrt(var_g + eps))
    mean_c = jnp.repeat(mean_g, C // G, axis=-1)
    inv_c = jnp.repeat(inv_g, C // G, axis=-1)
    w = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    if shift is not None:
        # normalize(x + t) = w·x + (b + w·t)
        b = b + w * shift.astype(jnp.float32)
    return w, b


def group_norm(
    x: jnp.ndarray,  # (B, H, W, C) or (B, S, C)
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    C = x.shape[-1]
    w, b = group_norm_fold(x, scale, bias, num_groups, eps)
    B = w.shape[0]
    # apply in the input dtype: normalized activations are O(1), bf16 is
    # plenty, and it halves the bandwidth of the normalize pass
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    out = x * w.astype(orig_dtype).reshape(shape) + b.astype(orig_dtype).reshape(shape)
    return out


class GroupNorm(nn.Module):
    """Drop-in replacement for nn.GroupNorm (same param names: scale/bias).

    fold_only=True returns the per-(batch, channel) affine (w, b) instead of
    the normalized tensor — consumed by the fused resblock kernel; `shift`
    folds a virtual per-channel addition into the statistics."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold_only: bool = False, shift=None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        if fold_only:
            return group_norm_fold(x, scale, bias, self.num_groups,
                                   self.epsilon, shift=shift)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)
