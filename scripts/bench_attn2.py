"""Focused interleaved A/B of stage-0 attention variants (noise-robust).

Runs each variant's timed loop multiple times round-robin and reports the
MIN per variant (the shared dev chip has 2x contention transients; min of
interleaved runs is the fairest comparator).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30
ROUNDS = 5


def build_loop(fn, q):
    def loop(q):
        def body(carry, _):
            return fn(carry).astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out
    return jax.jit(loop)


def flash_variant(block_q, block_k):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as pallas_flash)

    def fn(q):
        qt = q.transpose(0, 2, 1, 3)
        S = qt.shape[2]
        bq, bk = min(block_q, S), min(block_k, S)
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
        out = pallas_flash(qt, qt, qt, causal=False,
                           sm_scale=qt.shape[-1] ** -0.5, block_sizes=bs)
        return out.transpose(0, 2, 1, 3)
    return fn


def main():
    B, S, H, D = (int(x) for x in (sys.argv[1:] + ["8", "4096", "8", "40"])[:4])
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D)).astype(jnp.bfloat16)
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())

    from psd_tpu.ops.spattn import spatial_attention

    variants = {}
    variants["flash q1024 k1024"] = build_loop(flash_variant(1024, 1024), q)
    variants["spattn bq256"] = build_loop(
        lambda t: spatial_attention(t, t, t, block_q=256), q)
    variants["spattn qk8"] = build_loop(
        lambda t: spatial_attention(t, t, t, block_q=256, quant="qk8"), q)
    variants["spattn int8"] = build_loop(
        lambda t: spatial_attention(t, t, t, block_q=256, quant="int8"), q)

    # compile + correctness warmup
    ok = {}
    for name, fn in list(variants.items()):
        try:
            np.asarray(check(fn(q)))
            ok[name] = fn
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}")
    times = {name: [] for name in ok}
    for _ in range(ROUNDS):
        for name, fn in ok.items():
            t0 = time.perf_counter()
            s = np.asarray(check(fn(q)))
            assert np.isfinite(s)
            times[name].append(time.perf_counter() - t0)
    # overhead
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(check(tiny(q[:1, :1, 0])))
    oh = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(check(tiny(q[:1, :1, 0])))
        oh.append(time.perf_counter() - t0)
    oh = float(np.min(oh))
    print(f"B{B} S{S} H{H} D{D}  overhead {oh*1e3:.1f} ms  (min over {ROUNDS} interleaved rounds)")
    for name, ts in times.items():
        t = (min(ts) - oh) / REPS
        print(f"  {name:20s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
