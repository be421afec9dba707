"""Exact-path batch sweep for the headline configuration (VERDICT r2 #9).

Times the FULL fused generate program (50-step DDIM + VAE decode) at
several batch sizes in ONE process, interleaved round-robin with per-
variant minimum (the only trustworthy comparison on the shared dev chip —
docs/perf_notes.md). The headline metric is per-chip img/s; if a larger
batch wins after kernel/VMEM changes, bench.py's BATCH should follow.

  python scripts/bench_batch.py [--batches 4,8,12,16] [--steps 50]

--turbo sweeps the TURBO serving configuration (bench.py's current TURBO
dict — see bench.py for the quality-gated operating point) — its per-step work
is ~4× lighter, so fixed overheads (dispatch, VAE, key steps) take a
larger share and the optimal batch can differ from the exact path's.
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

ROUNDS = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="4,8,12,16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the sweep as a JSON artifact")
    ap.add_argument("--turbo", action="store_true",
                    help="sweep the turbo serving config (bench.py TURBO) "
                         "instead of the exact path")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    turbo = None
    if args.turbo:
        import bench

        turbo = bench.TURBO
        args.steps = turbo["steps"]

    enable_compile_cache()
    print(f"devices: {jax.devices()}")
    cfg = Config()
    cfg.diffusion.sampling_steps = args.steps
    core_cfg = core_config_from(
        cfg, remat=False, dtype=jnp.bfloat16,
        tome_ratio=turbo["tome_ratio"] if turbo else 0.0,
        tome_mode=turbo["tome_mode"] if turbo else "branch")
    model = DADD(cfg, core_cfg=core_cfg, vae_cfg=VAEConfig(
        dtype=jnp.bfloat16,
        quant=turbo["vae_quant"] if turbo else "none"))
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
    n_tok = 3 * core_cfg.num_aoe_tokens
    checksum = jax.jit(lambda t: t.astype(jnp.float32).sum())

    conds = {
        B: jax.random.normal(rng, (B, n_tok, 768), jnp.float32)
        for B in batches
    }

    def gen(B, key):
        kw = {}
        if turbo:
            kw = dict(encoder_stride=turbo["encoder_stride"],
                      cache_mode=turbo["cache_mode"],
                      sampler=turbo["sampler"])
        return model.generate(
            params, vae_params, conds[B], key, image_size=args.size,
            sampling_steps=args.steps, steer_scale=1.0, shared_noise=False,
            **kw)

    for B in batches:  # compile+warm
        s = np.asarray(checksum(gen(B, jax.random.PRNGKey(10))))
        assert np.isfinite(s)

    times = {B: [] for B in batches}
    for r in range(ROUNDS):
        for B in batches:
            t0 = time.perf_counter()
            s = np.asarray(checksum(gen(B, jax.random.PRNGKey(20 + r))))
            assert np.isfinite(s)
            times[B].append(time.perf_counter() - t0)

    rows = []
    for B in batches:
        t = min(times[B])
        rows.append({"batch": B, "s_per_batch": round(t, 4),
                     "img_per_s": round(B / t, 4)})
        print(f"  B={B:2d}  {t:7.3f} s/batch  {B / t:6.3f} img/s")
    best = max(rows, key=lambda r: r["img_per_s"])
    report = {
        "metric": ("turbo_path_batch_sweep" if turbo
                   else "exact_path_batch_sweep"),
        "steps": args.steps, "size": args.size,
        "rounds": ROUNDS, "timing": "interleaved min",
        "turbo_config": turbo,
        "rows": rows,
        "best_batch": best["batch"],
        "best_img_per_s": best["img_per_s"],
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
