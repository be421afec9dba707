"""Regional token-merging op tests (ops/tome.py).

ToMe is the quality-gated turbo lever — the invariants here guarantee it
degrades gracefully and that ratio=0 keeps the exact path bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.tome import (
    ToMeSpec,
    _region_indices,
    build_merge,
    merge,
    merged_call,
    unmerge,
)


def _x(B=2, H=8, W=8, C=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, H * W, C), jnp.float32)


def test_spec_r_count_quantization_and_gates():
    assert ToMeSpec(ratio=0.5, min_tokens=0).r_count(4096) == 2048  # m=2
    assert ToMeSpec(ratio=0.25, min_tokens=0).r_count(4096) == 1024  # m=1
    assert ToMeSpec(ratio=0.75, min_tokens=0).r_count(4096) == 3072  # m=3
    assert ToMeSpec(ratio=0.9, min_tokens=0).r_count(4096) == 3072  # clamp
    assert ToMeSpec(ratio=0.1, min_tokens=0).r_count(4096) == 0  # rounds to 0...
    assert ToMeSpec(ratio=0.5, min_tokens=4096).r_count(1024) == 0  # below min
    assert ToMeSpec(ratio=0.0).r_count(4096) == 0
    assert not ToMeSpec(ratio=0.0).active(4096)


def test_merge_unmerge_shapes_all_m():
    B, H, W, C = 2, 8, 8, 16
    x = _x(B, H, W, C)
    N = H * W
    for m in (1, 2, 3):
        r = m * (N // 4)
        mi = build_merge(x, H, W, r)
        xm = merge(x, mi)
        assert xm.shape == (B, N - r, C), (m, xm.shape)
        y = unmerge(xm, mi)
        assert y.shape == x.shape


def test_merge_is_mean_and_unmerge_copies_dst():
    """On a tensor where every 2x2 region is constant, merging is lossless:
    each merged src equals its dst, the mean of equals is the value, and
    unmerge reproduces the input exactly — at every m."""
    B, H, W, C = 2, 8, 8, 8
    base = jax.random.normal(jax.random.PRNGKey(1), (B, H // 2, W // 2, C))
    x = jnp.repeat(jnp.repeat(base, 2, axis=1), 2, axis=2).reshape(B, H * W, C)
    for m in (1, 2, 3):
        mi = build_merge(x, H, W, m * (H * W // 4))
        y = unmerge(merge(x, mi), mi)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5,
                                   err_msg=f"m={m}")


def test_unmerged_tokens_pass_through_exactly():
    """Tokens that are NOT merged must be bit-exact through merge→unmerge."""
    B, H, W, C = 1, 8, 8, 4
    x = _x(B, H, W, C, seed=3)
    N = H * W
    mi = build_merge(x, H, W, 2 * (N // 4))  # m=2: one kept src per region
    y = np.asarray(unmerge(merge(x, mi), mi))
    xn = np.asarray(x)
    _, src_idx, merge_mask, _, m = mi
    src_idx = np.asarray(src_idx)
    kept = ~np.asarray(merge_mask)  # (B, D, 3)
    kept_tokens = src_idx[kept[0]]
    assert kept_tokens.size == N // 4  # exactly one per region at m=2
    np.testing.assert_array_equal(y[0, kept_tokens], xn[0, kept_tokens])


def test_merged_tokens_get_their_region_dst_value():
    B, H, W, C = 1, 4, 4, 4
    x = _x(B, H, W, C, seed=4)
    mi = build_merge(x, H, W, 2 * (H * W // 4))
    y = np.asarray(unmerge(merge(x, mi), mi))
    dst_idx, src_idx, merge_mask, _, m = mi
    dst_idx, src_idx = np.asarray(dst_idx), np.asarray(src_idx)
    mm = np.asarray(merge_mask)[0]
    for d in range(dst_idx.size):
        for k in range(3):
            if mm[d, k]:
                np.testing.assert_allclose(
                    y[0, src_idx[d, k]], y[0, dst_idx[d]], rtol=1e-6,
                    err_msg=f"merged src {src_idx[d, k]} != dst {dst_idx[d]}",
                )


def test_merge_selects_most_similar():
    """At m=1, the merged src per region must be the one most similar to
    the dst (plant an exact duplicate)."""
    B, H, W, C = 1, 4, 4, 8
    x = np.array(_x(B, H, W, C, seed=5))
    dst_np, src_np = _region_indices(H, W)
    # region 2: make src slot 1 identical to the dst
    x[0, src_np[2, 1]] = x[0, dst_np[2]]
    mi = build_merge(jnp.asarray(x), H, W, H * W // 4)
    mm = np.asarray(mi[2])[0]
    assert mm[2].tolist() == [False, True, False]


def test_keep_least_similar_at_m2():
    """At m=2 the SURVIVING src is the least similar one (it carries the
    region's novel content)."""
    B, H, W, C = 1, 4, 4, 8
    x = np.array(_x(B, H, W, C, seed=6))
    dst_np, src_np = _region_indices(H, W)
    x[0, src_np[1, 0]] = x[0, dst_np[1]]
    x[0, src_np[1, 2]] = x[0, dst_np[1]]
    # slot 1 is the outlier → must be kept
    mi = build_merge(jnp.asarray(x), H, W, 2 * (H * W // 4))
    mm = np.asarray(mi[2])[0]
    assert mm[1].tolist() == [True, False, True]


def test_merged_call_under_jit_and_grad():
    B, H, W, C = 2, 8, 8, 8
    x = _x(B, H, W, C, seed=6)

    @jax.jit
    def f(x):
        mi = build_merge(x, H, W, 2 * (H * W // 4))
        return merged_call(lambda t: t * 2.0, x, mi).sum()

    v = f(x)
    assert np.isfinite(float(v))
    g = jax.grad(lambda x: f(x))(x)
    assert np.isfinite(np.asarray(g)).all()
