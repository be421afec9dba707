"""Interleaved A/B of the turbo operating point across DPM step counts.

Round-5 question: the distribution gate scores `dpm20+tome0.5+deep5(+int8)`
statistically equal to the dpm25 combo vs converged DPM-50 (FID 0.52 vs
0.53, CMMD at the sampling noise floor — bench_out/
bench_turbo_distribution.json), so 20 steps may be a free ~1.2x on the
headline. This times the FULL fused generate (scan + VAE decode, one
dispatch) at each step count round-robin in ONE process with per-variant
minimum — the only comparison that survives the shared dev chip's
throughput transients (docs/perf_notes.md "Methodology").

  python scripts/bench_turbo_steps.py [--steps 25,20] [--batch 8] \
      [--out bench_out/bench_turbo_steps.json]

The quality side of the re-pick decision lives in the gate artifacts, not
here: check_stride_quality.py (PSNR vs converged DPM) and
check_turbo_distribution.py (FID/CMMD, mean±std). Reference hot loop this
accelerates: evaluation_pipeline.py:867-975 (batched generation).
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

ROUNDS = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=str, default="25,20")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    step_list = [int(s) for s in args.steps.split(",")]
    B = args.batch

    import bench
    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    turbo = bench.TURBO
    enable_compile_cache()
    print(f"devices: {jax.devices()}  turbo={turbo}")

    cfg = Config()
    core_cfg = core_config_from(
        cfg, remat=False, dtype=jnp.bfloat16,
        tome_ratio=turbo["tome_ratio"], tome_mode=turbo["tome_mode"])
    model = DADD(cfg, core_cfg=core_cfg,
                 vae_cfg=VAEConfig(dtype=jnp.bfloat16,
                                   quant=turbo["vae_quant"]))
    rng = jax.random.PRNGKey(0)
    lat = args.size // 8

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    params = bf16(fast_init(
        model.core, {"params": rng, "noise": rng},
        jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, model.clip_cfg.num_positions, core_cfg.clip_hidden_dim)),
        0.0,
    ))
    vae_params = bf16(fast_init(
        model.vae, jax.random.PRNGKey(1),
        jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
        jax.random.PRNGKey(2),
    ))
    cond = jax.random.normal(rng, (B, 3 * core_cfg.num_aoe_tokens, 768),
                             jnp.float32)
    checksum = jax.jit(lambda t: t.astype(jnp.float32).sum())

    def gen(steps, key):
        return model.generate(
            params, vae_params, cond, key, image_size=args.size,
            sampling_steps=steps, steer_scale=1.0, shared_noise=False,
            encoder_stride=turbo["encoder_stride"],
            cache_mode=turbo["cache_mode"], sampler=turbo["sampler"])

    for s in step_list:  # compile+warm each step count (static shape)
        v = np.asarray(checksum(gen(s, jax.random.PRNGKey(10))))
        assert np.isfinite(v)

    times = {s: [] for s in step_list}
    for r in range(ROUNDS):
        for s in step_list:
            t0 = time.perf_counter()
            v = np.asarray(checksum(gen(s, jax.random.PRNGKey(20 + r))))
            assert np.isfinite(v)
            times[s].append(time.perf_counter() - t0)

    rows = []
    for s in step_list:
        t = min(times[s])
        rows.append({"steps": s, "s_per_batch": round(t, 4),
                     "img_per_s": round(B / t, 4)})
        print(f"  steps={s:3d}  {t:7.3f} s/batch  {B / t:6.3f} img/s")
    report = {
        "metric": "turbo_steps_sweep",
        "batch": B, "size": args.size,
        "config": {k: v for k, v in turbo.items() if k != "steps"},
        "rows": rows,
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
