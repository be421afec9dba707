"""SD-scale int8-vs-bf16 sampling comparison (on the real chip).

Samples the same seed/conditioning through the flagship model with
quant="none" and quant="int8" and reports PSNR/maxdiff between the decoded
images. The int8 graph is verified active by HLO inspection (636 i8
tensors at SD scale vs 0 in none-mode).

CAVEAT: with random (untrained) weights this measures an upper bound only
— the random UNet's eps is near-zero, so the DDIM trajectory is dominated
by the (identical) initial noise and the measured PSNR (92 dB at 256²/10
steps) mostly reflects that, not trained-model behavior. The real quality
gate must be re-run once trained weights exist; until then quant stays
default-OFF (primitive-level error bands in tests/test_quant.py).

Run on TPU: python scripts/check_int8_quality.py [--steps 10] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main_vae(args) -> None:
    """int8-vs-bf16 VAE DECODE quality: same latents, REAL flax-init
    decoder weights (fast_init's N(0,0.02) zeroes norm scales and collapses
    the feature maps — the exact degenerate regime the distribution gate
    flagged in round 4), report PSNR between the decoded image batches.
    Unlike the UNet sampling check above, the decoder is a deterministic
    function of its input, so this number is meaningful with random-but-
    well-scaled weights: it measures the quant path's numerical error
    through the real channel ladder, not trajectory luck."""
    from psd_tpu.models.vae import AutoencoderKL, VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache

    enable_compile_cache()
    lat = args.size // 8
    z = jax.random.normal(jax.random.PRNGKey(3),
                          (args.batch, lat, lat, 4), jnp.float32)

    imgs = {}
    params = None
    for quant in ("none", "int8"):
        vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16, quant=quant))
        if params is None:
            params = vae.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
                jax.random.PRNGKey(2))
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)

        def dec(p, z, _vae=vae):
            out = _vae.apply(p, z, method=_vae.decode)
            return jnp.clip(out.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        imgs[quant] = np.asarray(jax.jit(dec)(params, z), np.float64)
        assert np.isfinite(imgs[quant]).all()

    a, b = imgs["none"], imgs["int8"]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(json.dumps({
        "metric": "int8_vs_bf16_vae_decode_psnr_db",
        "value": round(psnr, 2),
        "max_abs_diff": round(float(np.max(np.abs(a - b))), 4),
        "size": args.size,
        "batch": args.batch,
        "weights": "real flax init (bf16 cast)",
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--vae", action="store_true",
                    help="compare int8-vs-bf16 VAE DECODE of the same "
                         "latents instead of full sampling")
    args = ap.parse_args()
    if args.vae:
        return main_vae(args)

    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    enable_compile_cache()
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    lat = args.size // 8

    imgs = {}
    params = None
    for quant in ("none", "int8"):
        core_cfg = core_config_from(cfg, remat=False, dtype=jnp.bfloat16,
                                    quant=quant)
        model = DADD(cfg, core_cfg=core_cfg,
                     vae_cfg=VAEConfig(dtype=jnp.bfloat16))
        if params is None:
            params = fast_init(
                model.core, {"params": rng, "noise": rng},
                jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1,)),
                jnp.zeros((1, model.clip_cfg.num_positions,
                           core_cfg.clip_hidden_dim)),
                0.0,
            )
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params,
            )
            vae_params = fast_init(
                model.vae, jax.random.PRNGKey(1),
                jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
                jax.random.PRNGKey(2),
            )
            n_tok = 3 * core_cfg.num_aoe_tokens
            cond = jax.random.normal(rng, (args.batch, n_tok, 768),
                                     jnp.float32)
        out = model.generate(
            params, vae_params, cond, jax.random.PRNGKey(7),
            image_size=args.size, sampling_steps=args.steps,
            steer_scale=1.0, shared_noise=False,
        )
        imgs[quant] = np.asarray(out, np.float64)
        assert np.isfinite(imgs[quant]).all()

    a, b = imgs["none"], imgs["int8"]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))  # images in [0,1]
    print(json.dumps({
        "metric": "int8_vs_bf16_sampling_psnr_db",
        "value": round(psnr, 2),
        "max_abs_diff": round(float(np.max(np.abs(a - b))), 4),
        "steps": args.steps,
        "size": args.size,
    }))


if __name__ == "__main__":
    main()
