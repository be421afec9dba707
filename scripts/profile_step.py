"""On-chip profiling for the UNet denoising step: batch scaling, component
isolation, and HBM bandwidth probes. Drives perf work (docs/perf_notes.md).

Through the axon dev relay each dispatch+sync costs ~35 ms of fixed latency,
so every micro-op is repeated `reps` times INSIDE one jitted scan (chained
through a carry so XLA cannot parallelize or DCE the iterations) and the
per-iteration time is (t_total - t_overhead) / reps.

Usage: python scripts/profile_step.py [--batches 8,16] [--skip-unet]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync_time(fn_jitted, *args, iters=3):
    check = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda a, x: a + x.astype(jnp.float32).sum(), t, jnp.float32(0)))
    np.asarray(check(fn_jitted(*args)))  # warmup/compile
    np.asarray(check(fn_jitted(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = np.asarray(check(fn_jitted(*args)))
        assert np.isfinite(s), s
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


_OVERHEAD = None


def dispatch_overhead():
    """Fixed relay cost of one dispatch+checksum round trip."""
    global _OVERHEAD
    if _OVERHEAD is None:
        tiny = jax.jit(lambda x: x + 1.0)
        _OVERHEAD = _sync_time(tiny, jnp.zeros((8, 128), jnp.float32), iters=5)
        print(f"dispatch overhead: {_OVERHEAD*1e3:.1f} ms")
    return _OVERHEAD


def timeit_op(fn, x, *rest, reps=20):
    """Per-iteration time of fn(x, *rest), chained through the carry.

    If fn's output matches x's shape/dtype the output is fed back directly;
    otherwise a traced scalar derived from the output perturbs the input
    (forces sequential execution, costs one extra elementwise pass)."""
    probe = jax.eval_shape(fn, x, *rest)
    chain = probe.shape == x.shape and probe.dtype == x.dtype

    def loop(x, *rest):
        def body(carry, _):
            if chain:
                return fn(carry, *rest), None
            s = fn(carry, *rest).ravel()[0].astype(x.dtype) * 1e-12
            return carry + s, None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    t = _sync_time(jax.jit(loop), x, *rest)
    return max(t - dispatch_overhead(), 1e-9) / reps


def probe_hbm(size_mb=512):
    n = size_mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)
    t = timeit_op(lambda a: a + 1.0, x, reps=10)
    gb = 2 * n * 4 / 1e9  # read N + write N
    print(f"HBM stream r/w {size_mb}MB: {t*1e3:.2f} ms/iter -> {gb/t:.0f} GB/s")


def probe_matmul(m=4096, k=4096, n=4096):
    a = jnp.ones((m, k), jnp.bfloat16)
    b = jnp.ones((k, n), jnp.bfloat16)
    # scale keeps the chained carry at 1.0 (ones @ ones = k per entry)
    f = lambda a, b: (
        jnp.dot(a, b, preferred_element_type=jnp.float32) * (1.0 / k)
    ).astype(jnp.bfloat16)
    t = timeit_op(f, a, b, reps=100)
    print(f"matmul {m}x{k}x{n} bf16: {t*1e3:.2f} ms -> {2*m*k*n/t/1e12:.0f} TFLOPS")


def profile_attention(B):
    from psd_tpu.ops.attention import dot_product_attention

    for S, H, D, tag in [(4096, 8, 40, "stage0"), (1024, 8, 80, "stage1")]:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D)).astype(jnp.bfloat16)
        t = timeit_op(lambda q: dot_product_attention(q, q, q), q, reps=30)
        fl = 2 * 2 * B * H * S * S * D
        flp = 2 * 2 * B * H * S * S * 128
        print(f"attn {tag} B{B} S{S} H{H} D{D}: {t*1e3:.2f} ms"
              f" ({fl/t/1e12:.1f} TFLOPS real, {flp/t/1e12:.1f} padded)")


def profile_geglu(B):
    from psd_tpu.ops.geglu import ln_geglu, _xla_reference

    S, C = 4096, 320
    x = jax.random.normal(jax.random.PRNGKey(0), (B * S, C)).astype(jnp.bfloat16)
    s = jnp.ones((C,), jnp.float32)
    bb = jnp.zeros((C,), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, C * 8)).astype(jnp.bfloat16) * 0.02
    b = jnp.zeros((C * 8,), jnp.float32)

    t_ref = timeit_op(lambda x: _xla_reference(x, s, bb, w, b, 1e-5), x, reps=50)
    t_fus = timeit_op(lambda x: ln_geglu(x, s, bb, w, b), x, reps=50)
    print(f"ln+geglu stage0 B{B}: xla {t_ref*1e3:.2f} ms, fused {t_fus*1e3:.2f} ms")


def profile_resblock(B):
    from psd_tpu.models.layers import ResnetBlock2D

    for H, C, tag in [(64, 320, "stage0"), (32, 640, "stage1"), (16, 1280, "stage2")]:
        m = ResnetBlock2D(C)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C)).astype(jnp.bfloat16)
        temb = jnp.ones((B, 1280), jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x, temb)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)
        t = timeit_op(lambda x: m.apply(p, x, temb), x, reps=50)
        print(f"resblock {tag} B{B} {H}x{H}x{C}: {t*1e3:.2f} ms")


def profile_unet(B, quant="none"):
    from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config
    from psd_tpu.utils.fast_init import fast_init

    cfg = sd14_unet_config(attn_mode="split3", quant=quant)
    unet = UNet2DCondition(cfg)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 48, 768), jnp.bfloat16)
    params = fast_init(unet, {"params": jax.random.PRNGKey(0)}, lat, t0, ctx, 0.0)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4)).astype(jnp.bfloat16)
    tt = jnp.full((B,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 48, 768)).astype(jnp.bfloat16)

    def loop(p, x, tt, c):
        def body(carry, _):
            return unet.apply(p, carry, tt, c, 0.5).astype(carry.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=10)
        return out

    t = (_sync_time(jax.jit(loop), params, x, tt, c) - dispatch_overhead()) / 10
    print(f"UNet eps B{B} 64x64 quant={quant}: {t*1e3:.2f} ms/step -> "
          f"{B/(t*50):.2f} img/s at 50 steps (ex-VAE)")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--skip-unet", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list: hbm,matmul,attn,geglu,resblock,unet")
    ap.add_argument("--quant", default="none", help="UNet quant mode")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    only = args.only.split(",") if args.only else None

    def want(name):
        return only is None or name in only

    from psd_tpu.utils.fast_init import enable_compile_cache
    enable_compile_cache()

    print(f"devices: {jax.devices()}")
    dispatch_overhead()
    if not args.skip_micro:
        if want("hbm"):
            probe_hbm()
        if want("matmul"):
            probe_matmul()
        for B in batches:
            if want("attn"):
                profile_attention(B)
            if want("geglu"):
                profile_geglu(B)
            if want("resblock"):
                profile_resblock(B)
    if (not args.skip_unet) and (only is None or "unet" in only):
        for B in batches:
            profile_unet(B, quant=args.quant)


if __name__ == "__main__":
    main()
