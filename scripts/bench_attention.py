"""Compare attention implementations on-chip at the UNet's shapes.

Variants: XLA einsum, Pallas flash (several block configs), single-pass
full-context kernel (ops/sattn.py). Prints per-call ms per variant.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync_time(fn_jitted, *args, iters=3):
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())
    np.asarray(check(fn_jitted(*args)))
    np.asarray(check(fn_jitted(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = np.asarray(check(fn_jitted(*args)))
        assert np.isfinite(s), s
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


_OVERHEAD = None


def overhead():
    global _OVERHEAD
    if _OVERHEAD is None:
        _OVERHEAD = _sync_time(jax.jit(lambda x: x + 1.0),
                               jnp.zeros((8, 128), jnp.float32), iters=5)
    return _OVERHEAD


def timeit_chain(fn, q, reps=30):
    def loop(q):
        def body(carry, _):
            return fn(carry).astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out
    return max(_sync_time(jax.jit(loop), q) - overhead(), 1e-9) / reps


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
    def _xla_reference(q, k, v, scale):
        import jax.numpy as jnp
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    print(f"devices: {jax.devices()}  overhead {overhead()*1e3:.1f} ms")
    for B, S, H, D, tag in [(8, 4096, 8, 40, "stage0"),
                            (8, 1024, 8, 80, "stage1"),
                            (16, 4096, 8, 40, "stage0x2")]:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D)).astype(jnp.bfloat16)
        rows = []
        rows.append(("xla", timeit_chain(
            lambda q: _xla_reference(q, q, q, D**-0.5), q)))
        for bq, bk in [(512, 512), (1024, 512), (1024, 1024), (2048, 1024)]:
            if bq > S or bk > S:
                continue
            try:
                t = timeit_chain(flash_variant(bq, bk), q)
                rows.append((f"flash q{bq} k{bk}", t))
            except Exception as e:
                rows.append((f"flash q{bq} k{bk}: FAIL {type(e).__name__}", -1))

        print(f"--- {tag}: B{B} S{S} H{H} D{D} ---")
        for name, t in rows:
            if t >= 0:
                print(f"  {name:18s} {t*1e3:7.3f} ms")
            else:
                print(f"  {name}")


if __name__ == "__main__":
    main()
