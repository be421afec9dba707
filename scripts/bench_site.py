"""Decompose the transformer-site SHELL cost (GN → proj_in → ... → proj_out
→ +residual, everything around the attention/FF math) at each UNet stage
shape, on the real chip.

The round-2 ablation attributed 9.7 ms/step to this shell by difference
(docs/perf_notes.md); difference methodology overcounts across fusion
boundaries. This times the shell directly — each variant is `reps`
iterations chained through a lax.scan carry in ONE dispatch, variants
interleaved round-robin with per-variant minimum (shared-chip contention
discipline, docs/perf_notes.md).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.norms import group_norm, group_norm_fold
from psd_tpu.utils.fast_init import enable_compile_cache

ROUNDS = 5
REPS = 30

# (H, W, C, sites/step) at 512² latents, B=8
STAGES = [
    ("stage0", 64, 64, 320, 5),
    ("stage1", 32, 32, 640, 5),
    ("stage2", 16, 16, 1280, 5),
    ("mid", 8, 8, 1280, 1),
]


def build_loop(fn, *args):
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # keep carry shape: fold output back into the carry
            return (carry + out.astype(carry.dtype) * 1e-6), None

        out, _ = jax.lax.scan(body, a[0], None, length=REPS)
        return out

    return jax.jit(loop), args


def sync(fn, args):
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())
    return float(np.asarray(check(fn(*args))))


def main():
    enable_compile_cache()
    print(f"devices: {jax.devices()}")
    B = 8
    key = jax.random.PRNGKey(0)

    for name, H, W, C, nsites in STAGES:
        x = jax.random.normal(key, (B, H, W, C)).astype(jnp.bfloat16)
        gs = jnp.ones((C,), jnp.float32)
        gb = jnp.zeros((C,), jnp.float32)
        w_in = (jax.random.normal(key, (C, C)) * 0.02).astype(jnp.bfloat16)
        b_in = jnp.zeros((C,), jnp.float32)
        w_out = (jax.random.normal(key, (C, C)) * 0.02).astype(jnp.bfloat16)
        b_out = jnp.zeros((C,), jnp.float32)

        def gn_only(t):
            return group_norm(t, gs, gb, 32, 1e-6)

        def gnfold_only(t):
            w, b = group_norm_fold(t, gs, gb, 32, 1e-6)
            return (w + b)[:, None, None, :].astype(t.dtype) + t * 0

        def proj(t, w, b):
            out = jnp.dot(
                t.reshape(-1, t.shape[-1]), w,
                preferred_element_type=jnp.float32,
            ) + b
            return out.astype(t.dtype).reshape(t.shape[:-1] + (w.shape[-1],))

        def shell(t):
            # GN -> proj_in -> (identity block) -> proj_out -> +residual
            h = group_norm(t, gs, gb, 32, 1e-6)
            h = proj(h, w_in, b_in)
            h = h.reshape(B, H * W, C)
            h = h.reshape(B, H, W, C)
            h = proj(h, w_out, b_out)
            return h + t

        def projout_resid(t):
            return proj(t, w_out, b_out) + t

        def fused_shell(t):
            from psd_tpu.ops.gnproj import gn_proj

            w, bb = group_norm_fold(t, gs, gb, 32, 1e-6)
            h = gn_proj(t.reshape(B, H * W, C), w, bb, (w_in,), (b_in,))[0]
            h = h.reshape(B, H, W, C)
            h = proj(h, w_out, b_out)
            return h + t

        variants = {
            "gn": build_loop(gn_only, x),
            "gnfold": build_loop(gnfold_only, x),
            "proj_in": build_loop(lambda t: proj(t, w_in, b_in), x),
            "projout+resid": build_loop(projout_resid, x),
            "shell(all)": build_loop(shell, x),
        }
        try:
            import psd_tpu.ops.gnproj  # noqa: F401

            variants["shell fused gnproj"] = build_loop(fused_shell, x)
        except ImportError:
            pass

        times = {n: [] for n in variants}
        for fn, args in variants.values():
            sync(fn, args)  # compile
        for _ in range(ROUNDS):
            for vn, (fn, args) in variants.items():
                t0 = time.perf_counter()
                s = sync(fn, args)
                assert np.isfinite(s)
                times[vn].append((time.perf_counter() - t0) / REPS)
        print(f"-- {name} (B{B} {H}x{W}x{C}, {nsites} sites/step)")
        for vn, ts in times.items():
            t = min(ts)
            print(f"  {vn:22s} {t*1e3:7.3f} ms  (x{nsites} = {t*1e3*nsites:6.2f} ms/step)")


if __name__ == "__main__":
    main()
