"""VAE decoder throughput at 512² batch 8 (decode-only MFU tool).

Interleaved timing (min over rounds, reps inside one jitted scan) of the
SD VAE decoder — the denominator of the headline img/s once the 50-step
DDIM scan shrinks. Decided here (round 3): the fused GN→SiLU→conv3x3
Pallas resblock kernel measured 196.7 ms vs 126.4 ms XLA on this exact
workload even with whole-weight VMEM residency (128/256/512-ch decoder
convs), so it was deleted; XLA's conv pipeline is the reference point
this script tracks (docs/perf_notes.md "fused resblock").
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.models.vae import AutoencoderKL, VAEConfig
from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

REPS = 5
ROUNDS = 6


def build(B, size, final_conv_fp32=False, quant="none"):
    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16,
                                  final_conv_fp32=final_conv_fp32,
                                  quant=quant))
    lat = size // 8
    z = jax.random.normal(jax.random.PRNGKey(0), (B, lat, lat, 4), jnp.float32)
    params = fast_init(
        vae, jax.random.PRNGKey(1),
        jnp.zeros((1, size, size, 3), jnp.bfloat16), jax.random.PRNGKey(2),
    )
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    def loop(p, z):
        def body(c, _):
            img = vae.apply(p, c, method=vae.decode)
            # feed a scalar back through the carry so steps chain
            return c + (img.mean() * 0).astype(c.dtype), img.mean()
        _, outs = jax.lax.scan(body, z, None, length=REPS)
        return outs.sum()

    fn = jax.jit(loop)
    out = np.asarray(fn(params, z))
    assert np.isfinite(out), out
    return fn, params, z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result as a JSON artifact")
    args = ap.parse_args()
    enable_compile_cache()
    print(f"devices: {jax.devices()} B={args.batch} size={args.size}")

    variants = {
        "decode (bf16 final conv)": build(args.batch, args.size, False),
        "decode (fp32 final conv)": build(args.batch, args.size, True),
        # W8A8 decoder resblock convs, vae-gated win region
        # (scripts/probe_int8.py --vae; quality: check_int8_quality --vae)
        "decode (int8 resblocks)": build(args.batch, args.size, False,
                                         quant="int8"),
    }
    times = {n: [] for n in variants}
    for _ in range(ROUNDS):
        for name, (fn, p, z) in variants.items():
            t0 = time.perf_counter()
            s = np.asarray(fn(p, z))
            assert np.isfinite(s)
            times[name].append(time.perf_counter() - t0)

    rows = []
    for name, ts in times.items():
        ms = min(ts) / REPS * 1e3
        rows.append({"variant": name, "ms_per_batch": round(ms, 2),
                     "img_per_s_decode_only": round(args.batch / (ms / 1e3), 3)})
        print(f"  {name} {ms:8.2f} ms/batch "
              f"({args.batch / (ms / 1e3):.2f} img/s decode-only)")
    report = {
        "metric": "vae_decode_512",
        "batch": args.batch, "size": args.size,
        "reps": REPS, "rounds": ROUNDS, "timing": "interleaved min",
        "rows": rows,
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
