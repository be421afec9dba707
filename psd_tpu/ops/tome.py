"""Token merging (ToMe) for the UNet transformer sites — TPU-native.

Quality-gated turbo lever (opt-in, `UNetConfig.tome_ratio`): at the 64×64
stage-0 sites the S=4096 self-attention dominates the exact-path step
(docs/perf_notes.md ablation). ToMe-for-SD (arXiv:2303.17098) merges the
most-similar tokens before attention and unmerges after — S² attention work
drops ~(1-r)², with near-no quality cost at r≈0.5 per the paper. NOT used
on the exact path: eps changes numerically (the reference has no such
approximation; sampling with tome_ratio=0.0 is bit-identical to never
importing this module).

TPU-first formulation (everything static-shape, sort-minimal):
  * bipartite partition: dst = the (0,0) token of every 2×2 region, src =
    the other three — STATIC index arrays (the ToMe-SD random per-call
    offset is dropped; one data-dependent argsort per site is the only
    dynamic step).
  * src→dst assignment: cosine-similarity argmax, computed as ONE batched
    matmul on the MXU (the (3N/4, N/4) score matrix at stage 0 costs
    ~16 GFLOP ≈ 0.1 ms — noise next to the ~2.4 ms/site attention saving).
  * top-r selection: argsort of the per-src best score (static r_count).
  * dst reduction (mean over merged srcs): one-hot MATMUL, not scatter —
    (B, D, r) @ (B, r, C) runs on the MXU; scatters serialize on TPU.
  * unmerge: a (B, N) gather map built with one tiny batched int32 scatter.

merge/unmerge are exact inverses on duplicate tokens (mean of equals), and
build_merge(r_count=0) is the identity (tested, tests/test_tome.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

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

    def r_count(self, n_tokens: int) -> int:
        """Merged-token count, clamped to the src set and MXU-aligned.

        N_keep = N - r_count stays a multiple of 128 so the downstream
        attention/FF kernels keep lane-aligned shapes."""
        if self.ratio <= 0.0 or n_tokens < self.min_tokens:
            return 0
        r = int(self.ratio * n_tokens)
        r = min(r, (3 * n_tokens) // 4)  # cannot merge more than src count
        align = 128 if n_tokens >= 1024 else 8  # lane alignment at real sites
        return (r // align) * align

    def active(self, n_tokens: int) -> bool:
        return self.r_count(n_tokens) > 0


def _partition(H: int, W: int) -> tuple[np.ndarray, np.ndarray]:
    """Static dst/src token indices for the 2×2 bipartite partition."""
    ii, jj = np.meshgrid(np.arange(0, H, 2), np.arange(0, W, 2), indexing="ij")
    dst = (ii * W + jj).reshape(-1)
    mask = np.zeros(H * W, dtype=bool)
    mask[dst] = True
    src = np.nonzero(~mask)[0]
    return dst.astype(np.int32), src.astype(np.int32)


@partial(jax.jit, static_argnums=(1, 2, 3), inline=True)
def build_merge(x: jnp.ndarray, H: int, W: int, r_count: int):
    """Compute the merge for one transformer block from its input.

    Args:
        x: (B, N, C) block input (the similarity metric, per ToMe-SD).
        H, W: spatial extent (N = H*W).
        r_count: number of src tokens to merge away (static).

    Returns an opaque tuple consumed by merge()/unmerge(). The SAME merge
    is reused for every op inside the block (attn / FF / cross-attn q),
    exactly as the ToMe-SD patch does.
    """
    B, N, C = x.shape
    assert N == H * W, (N, H, W)
    dst_np, src_np = _partition(H, W)
    dst_idx = jnp.asarray(dst_np)
    src_idx = jnp.asarray(src_np)
    D, S = dst_np.size, src_np.size
    assert 0 < r_count <= S, (r_count, S)

    xf = x.astype(jnp.float32)
    m = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-6)
    m = m.astype(x.dtype)
    m_src = jnp.take(m, src_idx, axis=1)  # (B, S, C)
    m_dst = jnp.take(m, dst_idx, axis=1)  # (B, D, C)
    scores = jnp.einsum(
        "bsc,bdc->bsd", m_src, m_dst, preferred_element_type=jnp.float32
    )
    node_max = jnp.max(scores, axis=-1)  # (B, S)
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, S)

    # most-similar src tokens get merged; the rest stay
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)  # (B, S)
    merged_pos = order[:, :r_count]  # positions into the src list
    kept_pos = order[:, r_count:]  # (B, S - r_count)
    merged_dst = jnp.take_along_axis(node_idx, merged_pos, axis=1)  # (B, r)

    # unmerge gather map: original token -> index into the merged sequence
    # layout [kept src (S - r) | dst (D)]
    n_keep_src = S - r_count
    g_kept_tok = src_idx[kept_pos]  # (B, S - r) batched fancy gather
    g_merged_tok = src_idx[merged_pos]  # (B, r)

    def build_map(kt, mt, md):
        g = jnp.zeros((N,), jnp.int32)
        g = g.at[kt].set(jnp.arange(n_keep_src, dtype=jnp.int32))
        g = g.at[dst_idx].set(n_keep_src + jnp.arange(D, dtype=jnp.int32))
        g = g.at[mt].set(n_keep_src + md)
        return g

    gather_map = jax.vmap(build_map)(g_kept_tok, g_merged_tok, merged_dst)
    return (src_idx, dst_idx, kept_pos, merged_pos, merged_dst, gather_map)


def merge(x: jnp.ndarray, mi) -> jnp.ndarray:
    """(B, N, C) → (B, N - r_count, C): kept src tokens, then dst means."""
    src_idx, dst_idx, kept_pos, merged_pos, merged_dst, _ = mi
    B, N, C = x.shape
    D = dst_idx.shape[0]
    r = merged_pos.shape[1]
    x_src = jnp.take(x, src_idx, axis=1)
    x_dst = jnp.take(x, dst_idx, axis=1)
    x_kept = jnp.take_along_axis(x_src, kept_pos[:, :, None], axis=1)
    x_merged = jnp.take_along_axis(x_src, merged_pos[:, :, None], axis=1)

    # segment-mean into dst as one-hot matmuls (MXU, not scatter)
    onehot = jax.nn.one_hot(merged_dst, D, dtype=x.dtype)  # (B, r, D)
    agg = jnp.einsum(
        "brd,brc->bdc", onehot, x_merged, preferred_element_type=jnp.float32
    )
    counts = jnp.sum(onehot.astype(jnp.float32), axis=1)  # (B, D)
    dst_out = (x_dst.astype(jnp.float32) + agg) / (1.0 + counts)[:, :, None]
    return jnp.concatenate([x_kept, dst_out.astype(x.dtype)], axis=1)


def unmerge(y: jnp.ndarray, mi) -> jnp.ndarray:
    """(B, N - r_count, C) → (B, N, C): merged tokens copy their dst."""
    gather_map = mi[5]
    return jnp.take_along_axis(y, gather_map[:, :, None], axis=1)


def merged_call(fn, x: jnp.ndarray, mi):
    """unmerge(fn(merge(x))) — the ToMe wrapper for one residual branch."""
    return unmerge(fn(merge(x, mi)), mi)
