"""ToMe overhead decomposition at the stage-0 site shape (B8, 4096, 320).

Times, interleaved in one process on the real chip:
  * build_merge (regional similarity einsum + mask/permutation build)
  * merge + unmerge round trip
  * spattn at S=4096 vs S=2048 (what the merge buys)
so the net win per site is (attn_4096 - attn_2048) - (build + merge costs).

  python scripts/bench_tome.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.ops.tome import build_merge, merge, unmerge
from psd_tpu.utils.fast_init import enable_compile_cache

REPS = 20
ROUNDS = 5
B, H, W, C = 8, 64, 64, 320
R = 2048  # ratio 0.5


def build_loop(fn, *args):
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
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
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H * W, C)).astype(jnp.bfloat16)

    def build_only(t):
        mi = build_merge(t, H, W, R)
        return mi[3].astype(jnp.float32).sum() + t[:, :1, :1] * 0

    def round_trip(t):
        mi = build_merge(t, H, W, R)
        return unmerge(merge(t, mi), mi)

    from psd_tpu.ops.spattn import spatial_attention

    def attn(t, S):
        q = t[:, :S, :].reshape(B, S, 8, 40)
        return spatial_attention(q, q, q).reshape(B, S, C)

    def attn_full(t):
        return attn(t, 4096)

    def attn_merged(t):
        return jnp.pad(attn(t, 2048), ((0, 0), (0, 2048), (0, 0)))

    variants = {
        "build_merge": build_loop(build_only, x),
        "merge+unmerge roundtrip": build_loop(round_trip, x),
        "spattn S=4096": build_loop(attn_full, x),
        "spattn S=2048": build_loop(attn_merged, x),
    }
    times = {n: [] for n in variants}
    for fn, args in variants.values():
        sync(fn, args)
    for _ in range(ROUNDS):
        for vn, (fn, args) in variants.items():
            t0 = time.perf_counter()
            s = sync(fn, args)
            assert np.isfinite(s)
            times[vn].append((time.perf_counter() - t0) / REPS)
    for vn, ts in times.items():
        print(f"  {vn:26s} {min(ts)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
