"""Regional token merging (ToMe-style) for the UNet transformer sites.

Quality-gated turbo lever (opt-in, `UNetConfig.tome_ratio`): at the 64×64
stage-0 sites the S=4096 self-attention dominates the exact-path step
(docs/perf_notes.md ablation). Merging similar tokens before attention and
unmerging after (ToMe for SD, arXiv:2303.17098) cuts the S² work. NOT used
on the exact path: eps changes numerically (the reference has no such
approximation; tome_ratio=0.0 is jaxpr-identical to never importing this).

TPU-first redesign — REGIONAL, not global, matching. ToMe-SD's global
bipartite soft matching needs a (3N/4, N/4) score matrix, a global
argsort, and scatters; measured on-chip that build cost (~4-6 ms/site at
stage 0) cancels the attention win (spattn 4096→2048 saves ~2.4 ms/site).
Here every 2×2 region keeps its (0,0) token as dst and merges the
`m ∈ {1,2,3}` src tokens MOST cosine-similar to that dst (the least
similar stay unmerged — they carry the region's novel content):

  * similarity: one einsum over (B, N/4, 3, C) — N·C work, ~50× less than
    the global score matrix, no sort anywhere (argmin/argmax over 3 slots).
  * merge: dst' = mean(dst + merged srcs) via masked sums — no scatters,
    no one-hot matmuls.
  * unmerge: a STATIC permutation gather (the region structure is static;
    only the per-region kept-slot choice is data-dependent).

ratio quantizes to m/4 (0.25, 0.5, 0.75): N_keep = N - m·N/4 stays
128-aligned by construction at every real site, so the downstream
attention/FF kernels keep lane-aligned shapes.

merge/unmerge are exact inverses on duplicate tokens (mean of equals), and
ratio=0 is the identity (tested, tests/test_tome.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ToMeSpec:
    """Static per-model ToMe settings (UNetConfig.tome_* surface)."""

    ratio: float = 0.0  # fraction of ALL N tokens merged away (0 = off)
    min_tokens: int = 4096  # apply only at sites with N >= this (stage 0)
    merge_mlp: bool = False  # also merge around the GEGLU feed-forward
    merge_cross: bool = False  # also merge the cross-attention query side
    # "branch": ToMe-SD composition — merge/unmerge around each configured
    #   residual branch separately (kept tokens keep their own residual
    #   stream; the weakest approximation).
    # "block": block-resident — ONE merge at transformer-block entry, the
    #   whole block (self-attn, cross-attn, FF, the LNs) runs at the merged
    #   length, ONE unmerge at exit. Stronger approximation (merged tokens
    #   adopt their region dst's residual stream for the whole block, as in
    #   the original ViT ToMe) but 3× fewer merge/unmerge round trips and
    #   every branch — not just the wrapped ones — gets the short length.
    mode: str = "branch"

    def r_count(self, n_tokens: int) -> int:
        """Merged-token count: ratio quantized to m/4, m ∈ {1, 2, 3}."""
        if self.ratio <= 0.0 or n_tokens < self.min_tokens:
            return 0
        m = min(3, int(round(self.ratio * 4.0)))
        if m < 1:
            return 0
        return m * (n_tokens // 4)

    def active(self, n_tokens: int) -> bool:
        return self.r_count(n_tokens) > 0


def _region_indices(H: int, W: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (dst, src) token indices per 2×2 region.

    dst: (D,) the (0,0) token of each region; src: (D, 3) the other three
    in slot order (0,1), (1,0), (1,1)."""
    ii, jj = np.meshgrid(np.arange(0, H, 2), np.arange(0, W, 2), indexing="ij")
    base = (ii * W + jj).reshape(-1)
    dst = base
    src = np.stack([base + 1, base + W, base + W + 1], axis=1)
    return dst.astype(np.int32), src.astype(np.int32)


def build_merge(x: jnp.ndarray, H: int, W: int, r_count: int):
    """Compute the merge for one transformer block from its input.

    Args:
        x: (B, N, C) block input (the similarity metric, per ToMe-SD).
        H, W: spatial extent (N = H*W; H and W even).
        r_count: merged-token count — must be m·(N/4) for m ∈ {1, 2, 3}.

    Returns an opaque tuple consumed by merge()/unmerge(). The SAME merge
    is reused for every wrapped op inside the block (attn / FF / cross-
    attn q), as in the ToMe-SD composition.
    """
    B, N, C = x.shape
    assert N == H * W and H % 2 == 0 and W % 2 == 0, (N, H, W)
    D = N // 4
    m, rem = divmod(r_count, D)
    assert rem == 0 and 1 <= m <= 3, (r_count, D)
    dst_np, src_np = _region_indices(H, W)
    dst_idx = jnp.asarray(dst_np)
    src_idx = jnp.asarray(src_np)

    if m == 3:
        # every src merges; no data-dependent choice at all
        merge_mask = jnp.ones((B, D, 3), bool)
    else:
        xf = x.astype(jnp.float32)
        mnorm = xf * jax.lax.rsqrt(
            jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-6
        )
        sd = jnp.take(mnorm, dst_idx, axis=1)  # (B, D, C)
        ss = mnorm[:, src_idx]  # (B, D, 3, C)
        sim = jnp.einsum("bdkc,bdc->bdk", ss, sd)  # (B, D, 3)
        if m == 2:
            keep = jnp.argmin(sim, axis=-1)  # the least similar survives
            merge_mask = (
                jnp.arange(3)[None, None, :] != keep[:, :, None]
            )
        else:  # m == 1
            merged = jnp.argmax(sim, axis=-1)
            merge_mask = (
                jnp.arange(3)[None, None, :] == merged[:, :, None]
            )

    # position of each src slot in the merged sequence
    # layout: [kept srcs in (region, slot) order (D·(3-m)) | dst' (D)]
    n_keep_src = D * (3 - m)
    kept = ~merge_mask  # (B, D, 3)
    # rank of each kept slot within its region (0..2-m), exclusive cumsum
    rank_in_region = jnp.cumsum(kept.astype(jnp.int32), axis=-1) - 1
    region_base = jnp.arange(D, dtype=jnp.int32)[None, :, None] * (3 - m)
    src_pos = jnp.where(
        kept, region_base + rank_in_region, n_keep_src + jnp.arange(
            D, dtype=jnp.int32)[None, :, None],
    )  # (B, D, 3): kept → its slot; merged → its region's dst'
    dst_pos = n_keep_src + jnp.arange(D, dtype=jnp.int32)[None, :].repeat(B, 0)

    # static inverse permutation token order [dst | src-flat] → token id
    order = np.concatenate([dst_np, src_np.reshape(-1)])
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size, dtype=order.dtype)
    vals = jnp.concatenate([dst_pos, src_pos.reshape(B, -1)], axis=1)
    gather_map = vals[:, jnp.asarray(inv)]  # (B, N) static-permutation gather
    return (dst_idx, src_idx, merge_mask, gather_map, m)


def merge(x: jnp.ndarray, mi) -> jnp.ndarray:
    """(B, N, C) → (B, N - m·N/4, C): kept srcs, then per-region dst means."""
    dst_idx, src_idx, merge_mask, _, m = mi
    B, N, C = x.shape
    D = dst_idx.shape[0]
    xd = jnp.take(x, dst_idx, axis=1).astype(jnp.float32)  # (B, D, C)
    xs = x[:, src_idx]  # (B, D, 3, C)
    maskf = merge_mask[..., None].astype(jnp.float32)
    dst_out = (xd + jnp.sum(xs.astype(jnp.float32) * maskf, axis=2)) / (
        1.0 + m
    )
    if m == 3:
        return dst_out.astype(x.dtype)
    # kept srcs, compacted in (region, slot) order: each region keeps
    # exactly 3-m slots, so a sorted-by-(kept desc, slot) gather compacts
    # without a scatter. For 3-m ∈ {1, 2} a slot-select does it directly.
    if m == 2:
        keep_slot = jnp.argmax(~merge_mask, axis=-1)  # (B, D)
        x_keep = jnp.take_along_axis(
            xs, keep_slot[:, :, None, None], axis=2
        )[:, :, 0]  # (B, D, C)
    else:  # m == 1: two kept slots per region, in slot order
        merged_slot = jnp.argmax(merge_mask, axis=-1)  # (B, D)
        slots = jnp.arange(3)[None, None, :]
        kept2 = jnp.stack(
            [
                jnp.where(merged_slot == 0, 1, 0),
                jnp.where(merged_slot == 2, 1, 2),
            ],
            axis=-1,
        )  # (B, D, 2) the two kept slot ids in ascending order
        del slots
        x_keep = jnp.take_along_axis(xs, kept2[..., None], axis=2)
        x_keep = x_keep.reshape(B, D * 2, C)
    return jnp.concatenate(
        [x_keep.reshape(B, -1, C).astype(x.dtype), dst_out.astype(x.dtype)],
        axis=1,
    )


def unmerge(y: jnp.ndarray, mi) -> jnp.ndarray:
    """(B, N - m·N/4, C) → (B, N, C): merged tokens copy their region dst'."""
    gather_map = mi[3]
    return jnp.take_along_axis(y, gather_map[:, :, None], axis=1)


def merged_call(fn, x: jnp.ndarray, mi):
    """unmerge(fn(merge(x))) — the ToMe wrapper for one residual branch."""
    return unmerge(fn(merge(x, mi)), mi)
