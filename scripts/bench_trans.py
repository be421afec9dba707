"""Decompose one Transformer2D site's overhead at the stage-0 shape.

Interleaved A/B (min over rounds) of the full site vs variants with the
GN, the proj_in/out pair, or the whole transformer body removed — locates
where the ablation's 9.7 ms/step of site overhead concentrates.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import psd_tpu.models.layers as L
from psd_tpu.utils.fast_init import enable_compile_cache

REPS = 30
ROUNDS = 5
B, H, W, C = 8, 64, 64, 320


def build(patches):
    m = L.Transformer2D(8, mode=L.CrossAttnMode("split3"))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)).astype(jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 48, 768)).astype(jnp.bfloat16)
    saved = [(cls, attr, getattr(cls, attr)) for cls, attr, _ in patches]
    try:
        for cls, attr, fn in patches:
            setattr(cls, attr, fn)
        params = m.init(jax.random.PRNGKey(2), x, ctx, 0.0)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )

        def loop(p, x, ctx):
            def body(c, _):
                return m.apply(p, c, ctx, 0.5).astype(c.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=REPS)
            return out

        fn = jax.jit(loop)
        out = fn(params, x, ctx)  # compile inside the patch scope
        return fn, params, x, ctx
    finally:
        for cls, attr, orig in saved:
            setattr(cls, attr, orig)


def main():
    enable_compile_cache()
    print(f"devices: {jax.devices()}")
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())

    orig_trans_block = L.BasicTransformerBlock.__call__
    orig_gn_call = None

    def block_noop(self, x, context, delta_scale=None):
        orig = orig_trans_block(self, x[:1, :256], context[:1, :1], delta_scale)
        return x + orig.mean().astype(x.dtype) * 0

    block_noop = nn.compact(block_noop)

    from psd_tpu.ops import norms

    orig_gn = norms.GroupNorm.__call__

    def gn_identity(self, x, fold_only=False, shift=None):
        out = orig_gn(self, x[:1, :8, :8], fold_only=fold_only, shift=shift)
        if fold_only:
            return out
        return x + (out.mean() * 0).astype(x.dtype)

    gn_identity = nn.compact(gn_identity)

    variants = {
        "full site": [],
        "blocks nulled (GN+proj only)": [
            (L.BasicTransformerBlock, "__call__", block_noop)],
        "GN identity": [(norms.GroupNorm, "__call__", gn_identity)],
    }

    built = {}
    for name, patches in variants.items():
        try:
            built[name] = build(patches)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")

    times = {n: [] for n in built}
    for _ in range(ROUNDS):
        for name, (fn, p, x, ctx) in built.items():
            t0 = time.perf_counter()
            s = np.asarray(check(fn(p, x, ctx)))
            assert np.isfinite(s)
            times[name].append(time.perf_counter() - t0)

    tiny = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    np.asarray(check(tiny(z)))
    oh = min(
        (lambda t0: (np.asarray(check(tiny(z))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    print(f"overhead {oh*1e3:.1f} ms; per-iter min over {ROUNDS} rounds:")
    for name, ts in times.items():
        print(f"  {name:32s} {(min(ts)-oh)/REPS*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
