"""Encoder-propagation quality gate: stride-{2,3,4} vs exact (stride 1).

Samples identical seed/conditioning at every encoder stride and reports,
per stride, the final-LATENT relative error and decoded-image PSNR vs the
stride-1 (mathematically exact) trajectory — the quality number the
`--encoder-stride` turbo serving point ships with (same pattern as
scripts/check_int8_quality.py; VERDICT r2 item 2).

Technique: Faster Diffusion (arXiv:2312.09608) — the UNet's down+mid
features change little between adjacent DDIM steps, so non-key steps re-run
only the decoder on cached encoder features. Key steps are exact; the gate
quantifies the non-key approximation end to end.

CAVEAT (same as the int8 gate): with random weights the UNet's eps field is
near-zero and smooth, so these numbers are an upper bound on quality — the
encoder features genuinely change less between steps than a trained model's
would. Re-run on trained weights the day they exist; until then the turbo
numbers ship with THIS table attached.

Run on TPU:
  python scripts/check_stride_quality.py [--steps 50] [--size 512] \
      [--strides 2,3,4] [--out bench_stride_quality.json]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--strides", type=str, default="2,3,4")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the table to this JSON file")
    args = ap.parse_args()
    strides = [int(s) for s in args.strides.split(",")]

    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    enable_compile_cache()
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    lat = args.size // 8

    core_cfg = core_config_from(cfg, remat=False, dtype=jnp.bfloat16)
    model = DADD(cfg, core_cfg=core_cfg, vae_cfg=VAEConfig(dtype=jnp.bfloat16))
    params = fast_init(
        model.core, {"params": rng, "noise": rng},
        jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, model.clip_cfg.num_positions, core_cfg.clip_hidden_dim)),
        0.0,
    )
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )
    vae_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        fast_init(
            model.vae, jax.random.PRNGKey(1),
            jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
            jax.random.PRNGKey(2),
        ),
    )
    n_tok = 3 * core_cfg.num_aoe_tokens
    cond = jax.random.normal(rng, (args.batch, n_tok, 768), jnp.float32)
    checksum = jax.jit(lambda t: t.astype(jnp.float32).sum())

    def run(stride):
        """(final latents, decoded images, best s/batch over 3 timed reps)."""
        def lat_fn(key):
            return model.sample(
                params, cond, key, image_size=args.size,
                sampling_steps=args.steps, steer_scale=1.0,
                shared_noise=False, encoder_stride=stride,
            )
        latents = np.asarray(lat_fn(jax.random.PRNGKey(7)), np.float64)
        imgs = np.asarray(
            model.decode_latents(vae_params, jnp.asarray(latents, jnp.float32)),
            np.float64,
        )
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            s = np.asarray(checksum(lat_fn(jax.random.PRNGKey(7))))
            assert np.isfinite(s)
            best = min(best, time.perf_counter() - t0)
        return latents, imgs, best

    lat1, img1, t1 = run(1)
    rows = []
    for s in strides:
        lat_s, img_s, t_s = run(s)
        rel = float(np.linalg.norm(lat_s - lat1) / max(np.linalg.norm(lat1), 1e-12))
        mse = float(np.mean((img_s - img1) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        rows.append({
            "stride": s,
            "latent_rel_error": round(rel, 6),
            "psnr_vs_exact_db": round(psnr, 2),
            "s_per_batch": round(t_s, 4),
            "img_per_s_ex_vae": round(args.batch / t_s, 4),
            "speedup_vs_exact": round(t1 / t_s, 4),
        })

    result = {
        "metric": "encoder_propagation_quality_vs_stride",
        "exact_s_per_batch": round(t1, 4),
        "exact_img_per_s_ex_vae": round(args.batch / t1, 4),
        "steps": args.steps,
        "size": args.size,
        "batch": args.batch,
        "weights": "random-init (upper bound; re-run on trained weights)",
        "rows": rows,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
