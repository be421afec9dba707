"""Interleaved A/B of the SD-scale UNet step with named kernels disabled.

The only trustworthy lever measurement on the shared dev chip is variants
traced in ONE process, timed interleaved round-robin with a per-variant
minimum (docs/perf_notes.md "measurement corrections"). This drives the
trace-time kill-switch (core/mode.disable_kernels) to build each variant:

  python scripts/bench_ab.py                      # baseline vs each kernel off
  python scripts/bench_ab.py --off gnproj         # one A/B pair
  python scripts/bench_ab.py --off gnproj,spattn  # one combined variant
"""

from __future__ import annotations

import argparse
import contextlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10
ROUNDS = 6

KNOWN = ["gnproj"]  # kernels with dispatch-gate kill-switch support


def build_step(off: tuple[str, ...]):
    from psd_tpu.core.mode import disable_kernels
    from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config
    from psd_tpu.utils.fast_init import fast_init

    cfg = sd14_unet_config(attn_mode="split3")
    unet = UNet2DCondition(cfg)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 48, 768), jnp.bfloat16)
    params = fast_init(unet, {"params": jax.random.PRNGKey(0)}, lat, t0, ctx, 0.0)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    def loop(p, x, tt, c):
        def body(carry, _):
            return unet.apply(p, carry, tt, c, 0.5).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    # the kill-switch is consulted at TRACE time: lower inside the scope
    with disable_kernels(*off) if off else contextlib.nullcontext():
        jitted = jax.jit(loop).lower(
            params,
            jax.ShapeDtypeStruct((8, 64, 64, 4), jnp.bfloat16),
            jax.ShapeDtypeStruct((8,), jnp.int32),
            jax.ShapeDtypeStruct((8, 48, 768), jnp.bfloat16),
        ).compile()
    return jitted, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--off", default=None,
                    help="comma list of kernels for ONE disabled variant; "
                         "default benches baseline vs each known kernel off")
    args = ap.parse_args()

    from psd_tpu.utils.fast_init import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}")

    variants: dict[str, tuple[str, ...]] = {"baseline": ()}
    if args.off:
        names = tuple(args.off.split(","))
        variants["-".join(names) + " OFF"] = names
    else:
        for n in KNOWN:
            variants[f"{n} OFF"] = (n,)

    params = None
    built = {}
    for name, off in variants.items():
        built[name], params = build_step(off)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 4)).astype(jnp.bfloat16)
    tt = jnp.full((8,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (8, 48, 768)).astype(jnp.bfloat16)
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())

    for name, fn in built.items():  # warm
        assert np.isfinite(np.asarray(check(fn(params, x, tt, c))))

    times = {n: [] for n in built}
    for _ in range(ROUNDS):
        for name, fn in built.items():
            t0 = time.perf_counter()
            s = np.asarray(check(fn(params, x, tt, c)))
            assert np.isfinite(s)
            times[name].append((time.perf_counter() - t0) / REPS)

    base = min(times["baseline"])
    for name, ts in times.items():
        t = min(ts)
        print(f"  {name:24s} {t*1e3:7.2f} ms/step  "
              f"({'+' if t >= base else ''}{(t - base)*1e3:.2f} vs baseline)")


if __name__ == "__main__":
    main()
