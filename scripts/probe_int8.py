"""Probe int8 MXU throughput vs bf16 on the attached chip.

v5e spec: bf16 197 TFLOPS, int8 394 TOPS. Measured (this script):
int8 only pays for DEEP contractions — dot 4096³ 2.3×, K=1280 1.8×,
K=512 1.2×, K=320 ~1.0×; conv3×3 2.0-2.5× at ≤32² (K=9·Cin ≥ 5760) but
0.9× at 64²·320ch. This sets MIN_QUANT_K in psd_tpu/ops/quant.py.

Methodology (docs/perf_notes.md): ops chained through a jitted scan carry
(relay dispatch ≈ 35 ms dwarfs single calls), reps adapted so device work
dominates overhead jitter, results data-depend on the chain so XLA cannot
DCE them (int arithmetic with a provably-zero multiplier gets folded —
first version of this script reported 3 exa-ops on a DCE'd conv)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts.profile_step import _sync_time, dispatch_overhead


def timeit_adaptive(fn, x, *rest, target_ms=60, max_reps=3000):
    """Per-iteration time; fn must be carry-chaining (out ~ x)."""
    probe = jax.eval_shape(fn, x, *rest)
    assert probe.shape == x.shape and probe.dtype == x.dtype

    def loop(reps):
        def run(x, *rest):
            def body(c, _):
                return fn(c, *rest), None
            out, _ = jax.lax.scan(body, x, None, length=reps)
            return out
        return jax.jit(run)

    t50 = _sync_time(loop(50), x, *rest)
    per = max((t50 - dispatch_overhead()) / 50, 1e-6)
    reps = min(max(50, int(target_ms * 1e-3 / per)), max_reps)
    t = _sync_time(loop(reps), x, *rest)
    return max(t - dispatch_overhead(), 1e-9) / reps


def probe_dot(m=4096, k=4096, n=4096):
    xb = jax.random.normal(jax.random.PRNGKey(0), (m, k)).astype(jnp.bfloat16)
    wb = (jax.random.normal(jax.random.PRNGKey(1), (k, n)) * (1.0 / k)).astype(
        jnp.bfloat16
    )
    xi = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 128, jnp.int8)
    wi = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 128, jnp.int8)

    def fb(x, w):
        return (jnp.dot(x, w, preferred_element_type=jnp.float32)).astype(x.dtype)

    def fi(x, w):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc >> 12).astype(jnp.int8)

    fl = 2 * m * k * n
    tb = timeit_adaptive(fb, xb, wb)
    ti = timeit_adaptive(fi, xi, wi)
    print(
        f"dot {m}x{k}x{n}: bf16 {tb*1e3:.3f} ms ({fl/tb/1e12:.0f} TF) | "
        f"int8 {ti*1e3:.3f} ms ({fl/ti/1e12:.0f} TOPS) ratio {tb/ti:.2f}x"
    )


def probe_conv(h, cin, cout, b=8):
    xb = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin)).astype(jnp.bfloat16)
    kb = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.02).astype(
        jnp.bfloat16
    )
    xi = jax.random.randint(jax.random.PRNGKey(0), (b, h, h, cin), -127, 128, jnp.int8)
    ki = jax.random.randint(jax.random.PRNGKey(1), (3, 3, cin, cout), -127, 128,
                            jnp.int8)
    dn = jax.lax.conv_dimension_numbers(xb.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))

    def fb(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        if cin == cout:
            return out.astype(x.dtype) * 0.02
        return x + out.mean(axis=-1, keepdims=True).astype(x.dtype) * 1e-6

    def fi(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        if cin == cout:
            return (out >> 12).astype(jnp.int8)
        return x + (out >> 12).astype(jnp.int8).max(axis=-1, keepdims=True)

    fl = 2 * b * h * h * 9 * cin * cout
    tb = timeit_adaptive(fb, xb, kb)
    ti = timeit_adaptive(fi, xi, ki)
    print(
        f"conv3x3 {h}x{h} {cin}->{cout} B{b}: bf16 {tb*1e3:.3f} ms "
        f"({fl/tb/1e12:.0f} TF) | int8 {ti*1e3:.3f} ms ({fl/ti/1e12:.0f} TOPS) "
        f"ratio {tb/ti:.2f}x"
    )


def probe_qconv_vae(h, cin, cout, b=8):
    """qconv3x3 (FULL quant path: per-sample act scales, per-Cout weight
    scales, dequant) vs plain bf16 conv at a real VAE-decoder shape — the
    honest A/B for wiring int8 into the decoder (VERDICT r3 weak #6: find
    int8 a consumer or delete it)."""
    from psd_tpu.ops.quant import qconv3x3

    xb = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin)).astype(jnp.bfloat16)
    kb = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.02).astype(
        jnp.bfloat16
    )
    dn = jax.lax.conv_dimension_numbers(xb.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))

    def chain(out, x):
        # carry-chain without assuming cin==cout: fold the output back into
        # the input so scan cannot DCE the conv
        if cin == cout:
            return (out * 0.02).astype(x.dtype)
        return x + out.mean(axis=-1, keepdims=True).astype(x.dtype) * 1e-6

    def fb(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        return chain(out, x)

    def fq(x, w):
        return chain(qconv3x3(x, w, out_dtype=jnp.float32), x)

    fl = 2 * b * h * h * 9 * cin * cout
    tb = timeit_adaptive(fb, xb, kb)
    tq = timeit_adaptive(fq, xb, kb)
    print(
        f"VAE qconv3x3 {h}x{h} {cin}->{cout} B{b}: bf16 {tb*1e3:.3f} ms "
        f"({fl/tb/1e12:.0f} TF) | int8(full quant) {tq*1e3:.3f} ms "
        f"({fl/tq/1e12:.0f} TOPS) ratio {tb/tq:.2f}x"
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--vae", action="store_true",
                    help="probe the VAE decoder's real conv shapes through "
                         "the full qconv3x3 quant path (int8 consumer A/B)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    dispatch_overhead()
    if args.vae:
        # 512² decode: z=64² → mid/up0 at 64²·512, up1 at 128²·512,
        # up2 at 256²·(512→256 then 256), up3 at 512²·(256→128 then 128)
        for b in (args.batch, args.batch * 2):
            probe_qconv_vae(64, 512, 512, b=b)
            probe_qconv_vae(128, 512, 512, b=b)
            probe_qconv_vae(256, 512, 256, b=b)
            probe_qconv_vae(256, 256, 256, b=b)
            probe_qconv_vae(512, 256, 128, b=b)
            probe_qconv_vae(512, 128, 128, b=b)
        return
    probe_dot()
    probe_dot(32768, 1280, 1280)
    probe_dot(32768, 512, 2048)
    probe_dot(32768, 320, 2560)
    probe_conv(64, 320, 320)
    probe_conv(32, 640, 640)
    probe_conv(16, 1280, 1280)


if __name__ == "__main__":
    main()
