"""Probe int8 MXU throughput vs bf16 on the attached chip.

v5e spec: bf16 197 TFLOPS, int8 394 TOPS. Validates that XLA lowers
int8×int8→int32 dot_general (and conv) onto the MXU at the doubled rate
before we commit to a W8A8 inference path. Methodology per
docs/perf_notes.md: reps chained through a jitted scan carry, dispatch
overhead subtracted, interleaved A/B.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts.profile_step import timeit_op, dispatch_overhead


def probe_dot(m=4096, k=4096, n=4096):
    ab = jnp.ones((m, k), jnp.bfloat16)
    bb = jnp.ones((k, n), jnp.bfloat16)
    ai = jnp.ones((m, k), jnp.int8)
    bi = jnp.ones((k, n), jnp.int8)

    fb = lambda a, b: (
        jnp.dot(a, b, preferred_element_type=jnp.float32) * (1.0 / k)
    ).astype(jnp.bfloat16)

    def fi(a, b):
        acc = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # rescale back to ones so the carry chain stays int8-representable
        return (acc // k).astype(jnp.int8)

    tb = timeit_op(fb, ab, bb, reps=100)
    ti = timeit_op(fi, ai, bi, reps=100)
    fl = 2 * m * k * n
    print(
        f"dot {m}x{k}x{n}: bf16 {tb*1e3:.2f} ms ({fl/tb/1e12:.0f} TFLOPS), "
        f"int8 {ti*1e3:.2f} ms ({fl/ti/1e12:.0f} TOPS), ratio {tb/ti:.2f}x"
    )


def probe_narrow_k(m=8192, k=40, n=4096):
    """QK^T-shaped: does int8 halve the padded-K pass cost too?"""
    ab = jnp.ones((m, k), jnp.bfloat16)
    bb = jnp.ones((k, n), jnp.bfloat16)
    ai = jnp.ones((m, k), jnp.int8)
    bi = jnp.ones((k, n), jnp.int8)
    fb = lambda a, b: (
        jnp.dot(a, b, preferred_element_type=jnp.float32) * (1.0 / k)
    ).astype(jnp.bfloat16)[:, :k].astype(jnp.bfloat16) * 0 + a

    def fb2(a, b):
        out = jnp.dot(a, b, preferred_element_type=jnp.float32)
        return a + (out.sum() * 0).astype(a.dtype)

    def fi2(a, b):
        out = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return a + (out.sum() * 0).astype(a.dtype)

    tb = timeit_op(fb2, ab, bb, reps=100)
    ti = timeit_op(fi2, ai, bi, reps=100)
    print(
        f"narrowK dot {m}x{k}x{n}: bf16 {tb*1e3:.3f} ms, int8 {ti*1e3:.3f} ms, "
        f"ratio {tb/ti:.2f}x"
    )


def probe_conv(h=64, cin=320, cout=320, b=8):
    xb = jnp.ones((b, h, h, cin), jnp.bfloat16)
    kb = jnp.ones((3, 3, cin, cout), jnp.bfloat16)
    xi = jnp.ones((b, h, h, cin), jnp.int8)
    ki = jnp.ones((3, 3, cin, cout), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(xb.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))

    def fb(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        return x + (out.sum() * 0).astype(x.dtype)

    def fi(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return x + (out.sum() * 0).astype(x.dtype)

    fl = 2 * b * h * h * 9 * cin * cout
    tb = timeit_op(fb, xb, kb, reps=50)
    print(f"conv3x3 {h}x{h}x{cin}->{cout} B{b}: bf16 {tb*1e3:.2f} ms ({fl/tb/1e12:.0f} TFLOPS)", flush=True)
    try:
        ti = timeit_op(fi, xi, ki, reps=50)
        print(f"  int8 {ti*1e3:.2f} ms ({fl/ti/1e12:.0f} TOPS), ratio {tb/ti:.2f}x")
    except Exception as e:
        print(f"  int8 conv failed: {type(e).__name__}: {str(e)[:200]}")


def main():
    print(f"devices: {jax.devices()}")
    dispatch_overhead()
    probe_dot()
    probe_narrow_k()
    probe_conv()
    probe_conv(32, 640, 640)
    probe_conv(16, 1280, 1280)


if __name__ == "__main__":
    main()
