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
    w, b = _affine_from_moments(s1, s2, n_per_group, scale, bias, G, C, eps)
    if shift is not None:
        # normalize(x + t) = w·x + (b + w·t)
        b = b + w * shift.astype(jnp.float32)
    return w, b


def _affine_from_moments(s1, s2, n_per_group, scale, bias, G, C, eps):
    """(per-channel Σx, Σx², group size) → per-(batch, channel) affine."""
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
    return w, b


def group_norm_fold_parts(
    parts,  # tensors (B, H, W, C_i) — a VIRTUAL channel concatenation
    scale: jnp.ndarray,  # (ΣC_i,)
    bias: jnp.ndarray,  # (ΣC_i,)
    num_groups: int = 32,
    eps: float = 1e-5,
):
    """group_norm_fold over the virtual concat of `parts` along channels,
    without materializing it (the UNet up-path skip joins: conv(concat) is
    later computed as split-weight convs, so the concat tensor never needs
    to exist). Per-channel moments are computed per part and concatenated —
    groups that straddle a part boundary combine exactly."""
    C = sum(p.shape[-1] for p in parts)
    G = num_groups
    assert C % G == 0, (C, G)
    spatial_axes = tuple(range(1, parts[0].ndim - 1))
    n_spatial = parts[0].size // parts[0].shape[0] // parts[0].shape[-1]
    s1 = jnp.concatenate(
        [jnp.sum(p, axis=spatial_axes, dtype=jnp.float32) for p in parts],
        axis=-1,
    )
    s2 = jnp.concatenate(
        [
            jnp.sum(p.astype(jnp.float32) * p.astype(jnp.float32),
                    axis=spatial_axes)
            for p in parts
        ],
        axis=-1,
    )
    n_per_group = n_spatial * (C // G)
    return _affine_from_moments(s1, s2, n_per_group, scale, bias, G, C, eps)


def group_norm(
    x: jnp.ndarray,  # (B, H, W, C) or (B, S, C)
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    num_groups: int = 32,
    eps: float = 1e-5,
    shift: jnp.ndarray | None = None,  # (B, C): GN(x + shift) without the add
) -> jnp.ndarray:
    orig_dtype = x.dtype
    C = x.shape[-1]
    w, b = group_norm_fold(x, scale, bias, num_groups, eps, shift=shift)
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
        if isinstance(x, (tuple, list)):
            # virtual concat of parts: return the folded per-(batch, channel)
            # affine over ΣC_i channels (see group_norm_fold_parts)
            C = sum(p.shape[-1] for p in x)
            scale = self.param("scale", nn.initializers.ones, (C,),
                               self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (C,),
                              self.param_dtype)
            return group_norm_fold_parts(x, scale, bias, self.num_groups,
                                         self.epsilon)
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        if fold_only:
            return group_norm_fold(x, scale, bias, self.num_groups,
                                   self.epsilon, shift=shift)
        # shift ≠ None: GN(x + shift) with the addition folded analytically
        # into the statistics and affine — x + shift never materializes
        # (the resblock's h + temb join)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon,
                          shift=shift)
