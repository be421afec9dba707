"""Round-3 micro A/Bs: ln_geglu block_m sweep + conv_out dtype.

Interleaved min-of-rounds (shared-chip methodology, docs/perf_notes.md).
1) ln_geglu at the stage-0 FF shape with block_m ∈ {512, 1024, 2048}:
   weight re-streaming scales with M/BM (64 row-blocks × 1.6 MB at 512),
   so larger row blocks should shave the fixed weight traffic.
2) UNet conv_out (K=2880, N=4) in fp32 (current) vs bf16-in/fp32-accum:
   fp32 MXU contractions run multi-pass; the N=4→128 lane padding makes
   this conv all-overhead either way, but the pass count still triples.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.utils.fast_init import enable_compile_cache

REPS = 30
ROUNDS = 5


def build_loop(fn, *args):
    def loop(*a):
        def body(c, _):
            out = fn(c, *a[1:])
            return (c + (out.astype(jnp.float32).sum() * 0).astype(c.dtype)), None
        c, _ = jax.lax.scan(body, a[0], None, length=REPS)
        return c.astype(jnp.float32).sum()

    j = jax.jit(loop)
    s = np.asarray(j(*args))
    assert np.isfinite(s), s
    return j, args


def main():
    enable_compile_cache()
    print(f"devices: {jax.devices()}")
    variants = {}

    # --- 1) ln_geglu block_m sweep (stage-0: M=32768, C=320, N=1280) ---
    from psd_tpu.ops.geglu import ln_geglu

    M, C, N = 8 * 4096, 320, 1280
    x = jax.random.normal(jax.random.PRNGKey(0), (M, C), jnp.bfloat16)
    s = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    w0 = (jax.random.normal(jax.random.PRNGKey(1), (C, 2 * N)) * 0.02).astype(
        jnp.bfloat16)
    b0 = jnp.zeros((2 * N,), jnp.float32)
    for bm in (512, 1024, 2048, 4096):
        try:
            variants[f"ln_geglu bm{bm}"] = build_loop(
                lambda t, s, b, w, bb, bm=bm: ln_geglu(t, s, b, w, bb, 1e-5, bm),
                x, s, b, w0, b0,
            )
        except Exception as e:
            print(f"ln_geglu bm{bm}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # --- 2) conv_out dtype (64² latents, 320→4) ---
    h = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 320), jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 320, 4)) * 0.02)

    def conv(t, k, dt):
        return jax.lax.conv_general_dilated(
            t.astype(dt), k.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    variants["conv_out fp32"] = build_loop(lambda t, k: conv(t, k, jnp.float32), h, k)
    variants["conv_out bf16"] = build_loop(lambda t, k: conv(t, k, jnp.bfloat16), h, k)

    # N=4 pads to 128 lanes either way — hand XLA the padded-N conv so its
    # layout choice isn't driven by the tiny logical N
    kpad = jnp.zeros((3, 3, 320, 128), k.dtype).at[..., :4].set(k)
    variants["conv_out bf16 N128"] = build_loop(
        lambda t, kp: conv(t, kp, jnp.bfloat16), h, kpad)

    # 9-shifted-matmul formulation (no im2col blowup: one matmul per tap)
    def conv_shift(t, k):
        B_, H_, W_, C_ = t.shape
        N_ = k.shape[-1]
        tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B_, H_, W_, N_), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(
                    tp[:, dy : dy + H_, dx : dx + W_, :],
                    k[dy, dx].astype(t.dtype),
                    preferred_element_type=jnp.float32,
                )
        return acc

    variants["conv_out 9shift"] = build_loop(conv_shift, h, k)

    times = {n: [] for n in variants}
    for _ in range(ROUNDS):
        for name, (fn, args) in variants.items():
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"  {name:20s} {min(ts) / REPS * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
