"""Token-merging op tests (ops/tome.py).

ToMe is the quality-gated turbo lever — the invariants here guarantee it
degrades gracefully and that ratio=0 keeps the exact path bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.tome import ToMeSpec, build_merge, merge, merged_call, unmerge


def _x(B=2, H=8, W=8, C=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, H * W, C), jnp.float32)


def test_spec_r_count_alignment_and_gates():
    s = ToMeSpec(ratio=0.5, min_tokens=64)
    assert s.r_count(64) == 32  # small sites align to 8
    # real sites align to 128 lanes
    assert ToMeSpec(ratio=0.5, min_tokens=0).r_count(4096) == 2048
    assert ToMeSpec(ratio=0.9, min_tokens=0).r_count(4096) == 3072  # src cap
    assert ToMeSpec(ratio=0.5, min_tokens=4096).r_count(1024) == 0  # below min
    assert ToMeSpec(ratio=0.0).r_count(4096) == 0
    assert not ToMeSpec(ratio=0.0).active(4096)


def test_merge_unmerge_shapes():
    B, H, W, C = 2, 8, 8, 16
    x = _x(B, H, W, C)
    r = 16
    mi = build_merge(x, H, W, r)
    xm = merge(x, mi)
    assert xm.shape == (B, H * W - r, C)
    y = unmerge(xm, mi)
    assert y.shape == x.shape


def test_merge_is_mean_and_unmerge_copies_dst():
    """On a tensor where every 2x2 region is constant, merging is lossless:
    each merged src equals its dst, the mean of equals is the value, and
    unmerge reproduces the input exactly."""
    B, H, W, C = 2, 8, 8, 8
    base = jax.random.normal(jax.random.PRNGKey(1), (B, H // 2, W // 2, C))
    x = jnp.repeat(jnp.repeat(base, 2, axis=1), 2, axis=2).reshape(B, H * W, C)
    r = 32
    mi = build_merge(x, H, W, r)
    xm = merge(x, mi)
    y = unmerge(xm, mi)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_unmerged_tokens_pass_through_exactly():
    """Tokens that are NOT merged must be bit-exact through merge→unmerge."""
    B, H, W, C = 1, 8, 8, 4
    x = _x(B, H, W, C, seed=3)
    r = 16
    mi = build_merge(x, H, W, r)
    y = np.asarray(unmerge(merge(x, mi), mi))
    xn = np.asarray(x)
    src_idx, dst_idx, kept_pos, merged_pos, _, _ = (
        np.asarray(mi[0]), np.asarray(mi[1]), np.asarray(mi[2]),
        np.asarray(mi[3]), None, None,
    )
    kept_tokens = src_idx[kept_pos[0]]
    np.testing.assert_array_equal(y[0, kept_tokens], xn[0, kept_tokens])
    # dst tokens change only by the merge-mean; with r < S some dst have no
    # merged src and must also be exact
    merged_tokens = set(src_idx[merged_pos[0]].tolist())
    assert len(merged_tokens) == r


def test_merged_tokens_get_their_dst_value():
    B, H, W, C = 1, 4, 4, 4
    x = _x(B, H, W, C, seed=4)
    r = 4
    mi = build_merge(x, H, W, r)
    xm = merge(x, mi)
    y = np.asarray(unmerge(xm, mi))
    src_idx, dst_idx = np.asarray(mi[0]), np.asarray(mi[1])
    merged_pos = np.asarray(mi[3])[0]
    merged_dst = np.asarray(mi[4])[0]
    for p, d in zip(merged_pos, merged_dst):
        tok = src_idx[p]
        np.testing.assert_allclose(
            y[0, tok], y[0, dst_idx[d]], rtol=1e-6,
            err_msg=f"merged src {tok} != its dst {dst_idx[d]}",
        )


def test_merge_reduces_most_similar():
    """Plant one src token identical to its dst; with r=smallest it must be
    the merged one (cosine similarity 1.0 beats random)."""
    B, H, W, C = 1, 8, 8, 8
    x = np.array(_x(B, H, W, C, seed=5))
    from psd_tpu.ops.tome import _partition

    dst_np, src_np = _partition(H, W)
    x[0, src_np[7]] = x[0, dst_np[3]]
    mi = build_merge(jnp.asarray(x), H, W, 1)
    merged_pos = np.asarray(mi[3])[0]
    assert merged_pos[0] == 7
    assert np.asarray(mi[4])[0][0] == 3


def test_merged_call_under_jit_and_grad():
    B, H, W, C = 2, 8, 8, 8
    x = _x(B, H, W, C, seed=6)

    @jax.jit
    def f(x):
        mi = build_merge(x, H, W, 16)
        return merged_call(lambda t: t * 2.0, x, mi).sum()

    v = f(x)
    assert np.isfinite(float(v))
    g = jax.grad(lambda x: f(x))(x)
    assert np.isfinite(np.asarray(g)).all()
