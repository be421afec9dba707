"""Turbo-path quality gate: feature propagation × ToMe vs the exact path.

Samples identical seed/conditioning for every requested turbo variant and
reports, per variant, the final-LATENT relative error and decoded-image
PSNR vs the exact trajectory, plus measured sampling throughput — the
quality table every turbo serving point ships with (same pattern as
scripts/check_int8_quality.py; VERDICT r2 item 2).

Variants (comma list, --variants):
  encN        encoder propagation stride N (Faster Diffusion, 2312.09608)
  deepN       DeepCache branch caching interval N (2310.01407)
  tomeR       ToMe token merging ratio R at the 64² sites (2303.17098)
  tomebR      block-resident ToMe (one merge per transformer block; the
              whole block runs merged — faster, stronger approximation)
  dpmN        DPM-Solver++(2M) sampler at N steps (2211.01095) — compared
              against the SAME exact baseline (--steps DDIM), so the table
              answers "what do I lose cutting 50 DDIM steps to N DPM steps"
  tomeR+deepN / tomeR+encN / tomebR+deepN / dpmN+tomebR+deepK  compositions

CAVEAT (same as the int8 gate): with random weights the UNet's eps field is
near-zero and smooth, so these numbers are an upper bound on quality — the
cached features genuinely change less between steps than a trained model's
would. `--train-steps N` closes most of that gap without any pretrained
checkpoint: it first trains the SD-scale model for N real optimizer steps
on a class-structured synthetic task (low-frequency latents whose contrast
and bias depend on the MES class; per-class CLIP-feature anchors), then
measures the table on those weights WITH in-distribution conditioning from
prepare_conditioning — so the eps field has genuine t- and class-dependent
structure. Still not CompVis weights (none exist in this environment);
re-run with real checkpoints via scripts/port_weights.py the day they do.

Run on TPU:
  python scripts/check_stride_quality.py [--steps 50] [--size 512] \
      [--variants enc2,enc3,deep3,tome0.5+deep3] [--out table.json] \
      [--train-steps 500]
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


def parse_variant(tok: str) -> dict:
    v = {"tome": 0.0, "tome_mode": "branch", "stride": 1,
         "cache_mode": "encoder", "sampler": "ddim", "steps": None,
         "vae_quant": "none", "name": tok}
    for part in tok.split("+"):
        if part == "int8":
            # W8A8 VAE-decoder resblock convs (models/vae.py quant="int8");
            # latent-space tables ignore it, the distribution gate decodes
            # each variant with its own VAE path
            v["vae_quant"] = "int8"
        elif part.startswith("dpm"):
            v["sampler"] = "dpm"
            v["steps"] = int(part[3:])
        elif part.startswith("tomeb"):
            v["tome"] = float(part[5:])
            v["tome_mode"] = "block"
        elif part.startswith("tome"):
            v["tome"] = float(part[4:])
        elif part.startswith("enc"):
            v["stride"] = int(part[3:])
            v["cache_mode"] = "encoder"
        elif part.startswith("deep"):
            v["stride"] = int(part[4:])
            v["cache_mode"] = "deep"
        else:
            raise SystemExit(f"unknown variant token: {part!r}")
    return v


def synth_train(cfg, steps: int, *, image_size: int = 256, batch: int = 8):
    """N real AdamW steps on a class-structured synthetic task at SD scale.

    Returns (params fp32, per-class clip-feature anchors). The task gives
    the eps field genuine structure: latents are low-frequency fields whose
    contrast/bias depend on the class, and the conditioning stream carries
    per-class CLIP anchors — so DeepCache/ToMe/stride approximations are
    exercised on features that actually move between steps and classes.
    """
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.train import build_optimizer, make_train_step
    from psd_tpu.train.ema import ema_init
    from psd_tpu.train.trainer import TrainState

    core_cfg = core_config_from(cfg, remat=True, dtype=jnp.bfloat16)
    model = DADD(cfg, core_cfg=core_cfg)
    lat = image_size // 8
    n_pos = model.clip_cfg.num_positions
    c_dim = core_cfg.clip_hidden_dim
    n_cls = cfg.dataset.num_classes

    # REAL flax init (norm scales = 1, proper fan-in variance) — fast_init's
    # every-leaf N(0, 0.02²) fill is a throughput-only init that training
    # cannot recover from in a few hundred steps (ADVICE r3). Param shapes
    # are spatial-size-independent, so init at a small size to keep the
    # one-off init trace cheap.
    params = model.init_core(jax.random.PRNGKey(0), image_size=128)
    # Spread warmup+cosine across the N steps: the epoch-wise schedule
    # computes epoch = step // steps_per_epoch, so steps_per_epoch must
    # partition the run into max_epochs epochs — passing `steps` directly
    # pins every step to epoch 0 = warmup start = lr·0.01 (ADVICE r3).
    tx = build_optimizer(
        cfg, steps_per_epoch=max(steps // cfg.training.max_epochs, 1))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema=ema_init(params["params"], dtype=jnp.bfloat16),
    )
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    anchors = jax.random.normal(jax.random.PRNGKey(11), (n_cls, n_pos, c_dim))

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        labels = jax.random.randint(k1, (batch,), 0, n_cls)
        base = jax.random.normal(k2, (batch, lat // 4, lat // 4, 4))
        field = jax.image.resize(base, (batch, lat, lat, 4), "linear")
        amp = (0.5 + 0.35 * labels.astype(jnp.float32))[:, None, None, None]
        bias = 0.3 * (labels.astype(jnp.float32) - (n_cls - 1) / 2)
        lats = amp * field + bias[:, None, None, None]
        feats = anchors[labels] + 0.1 * jax.random.normal(
            k3, (batch, n_pos, c_dim))
        return {"latents": lats,
                "labels": labels.astype(jnp.float32),
                "clip_feats": feats}

    rng = jax.random.PRNGKey(5)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, make_batch(jax.random.fold_in(rng, i)),
                                 rng)
        if i % 100 == 0 or i == steps - 1:
            print(f"synth-train step {i}: loss={float(metrics['loss']):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    trained = state.params
    del state, step_fn  # free AdamW moments + EMA before the 512² samplers
    import gc

    gc.collect()
    return trained, anchors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="first train the SD-scale model this many steps on "
                         "a class-structured synthetic task, then gate on "
                         "those weights (see docstring)")
    ap.add_argument("--variants", type=str,
                    default="enc2,enc3,deep3,deep5,tome0.5,tomeb0.5,"
                            "tome0.5+deep5,tomeb0.5+deep5,tomeb0.5+deep6,"
                            "dpm25,dpm20,dpm25+tomeb0.5+deep5")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the table to this JSON file")
    args = ap.parse_args()
    variants = [parse_variant(t) for t in args.variants.split(",")]

    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    enable_compile_cache()
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    lat = args.size // 8

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    models = {}

    def get_model(tome: float, tome_mode: str = "branch") -> DADD:
        key = (tome, tome_mode)
        if key not in models:
            core_cfg = core_config_from(cfg, remat=False, dtype=jnp.bfloat16,
                                        tome_ratio=tome, tome_mode=tome_mode)
            models[key] = DADD(cfg, core_cfg=core_cfg,
                               vae_cfg=VAEConfig(dtype=jnp.bfloat16))
        return models[key]

    base_model = get_model(0.0)
    core_cfg = base_model.core_cfg
    if args.train_steps > 0:
        trained, anchors = synth_train(cfg, args.train_steps,
                                       batch=args.batch)
        params = bf16(trained)
        del trained
        weights_note = (f"synthetic-trained {args.train_steps} steps "
                        "(class-structured latents + per-class CLIP "
                        "anchors; in-distribution conditioning)")
    else:
        params = bf16(fast_init(
            base_model.core, {"params": rng, "noise": rng},
            jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,)),
            jnp.zeros((1, base_model.clip_cfg.num_positions,
                       core_cfg.clip_hidden_dim)),
            0.0,
        ))
        weights_note = "random-init (upper bound; see --train-steps)"
    if args.train_steps > 0:
        # REAL flax init for the decoder: fast_init's N(0,0.02) fill zeroes
        # the GroupNorm scales, collapsing decoded images toward a constant
        # — PSNR through that decoder would mask exactly the latent
        # differences this gate measures (same reasoning as
        # check_turbo_distribution.py's backbones).
        vae_params = bf16(base_model.vae.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
            jax.random.PRNGKey(2),
        ))
    else:
        vae_params = bf16(fast_init(
            base_model.vae, jax.random.PRNGKey(1),
            jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
            jax.random.PRNGKey(2),
        ))
    n_tok = 3 * core_cfg.num_aoe_tokens
    if args.train_steps > 0:
        # IN-distribution conditioning: training always pairs clip feats of
        # class y with label y and source==target (delta tokens = 0, as the
        # reference trains, diffusion_module_ip.py:392-445) — so the gate
        # conditions the same way (ADVICE r3: a src≠tgt progression path
        # the synthetic training never exercised would measure feature
        # drift in an arbitrary regime, not trained behavior).
        n_cls = cfg.dataset.num_classes
        tgt = jnp.tile(jnp.arange(n_cls, dtype=jnp.float32),
                       (args.batch + n_cls - 1) // n_cls)[:args.batch]
        feats = anchors[tgt.astype(jnp.int32)]
        cond = base_model.prepare_inference_cond(params, tgt, tgt, feats)
    else:
        cond = jax.random.normal(rng, (args.batch, n_tok, 768), jnp.float32)
    checksum = jax.jit(lambda t: t.astype(jnp.float32).sum())

    def run(v):
        """(final latents, decoded images, best s/batch over 3 timed reps)."""
        model = get_model(v["tome"], v.get("tome_mode", "branch"))

        def lat_fn(key):
            return model.sample(
                params, cond, key, image_size=args.size,
                sampling_steps=v.get("steps") or args.steps,
                steer_scale=1.0,
                shared_noise=False, encoder_stride=v["stride"],
                cache_mode=v["cache_mode"],
                sampler=v.get("sampler", "ddim"),
            )
        latents = np.asarray(lat_fn(jax.random.PRNGKey(7)), np.float64)
        imgs = np.asarray(
            base_model.decode_latents(vae_params,
                                      jnp.asarray(latents, jnp.float32)),
            np.float64,
        )
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            s = np.asarray(checksum(lat_fn(jax.random.PRNGKey(7))))
            assert np.isfinite(s)
            best = min(best, time.perf_counter() - t0)
        return latents, imgs, best

    lat1, img1, t1 = run({"tome": 0.0, "stride": 1, "cache_mode": "encoder"})
    # converged-DPM baseline (only if a dpm variant is requested): DPM-N is
    # a DIFFERENT ODE solver, so vs-DDIM error conflates solver identity
    # with step-count degradation; vs dpm-at-args.steps isolates the latter
    # (VERDICT r3 missing #2). On an undertrained eps field the solver
    # delta dominates — the distribution gate (check_turbo_distribution.py)
    # is the product arbiter there.
    lat_dpm50 = img_dpm50 = None
    if any(v.get("sampler") == "dpm" for v in variants):
        lat_dpm50, img_dpm50, _ = run(
            {"tome": 0.0, "stride": 1, "cache_mode": "encoder",
             "sampler": "dpm", "steps": args.steps})
    rows = []

    def table() -> dict:
        return {
            "metric": "turbo_quality_vs_exact",
            "exact_s_per_batch": round(t1, 4),
            "exact_img_per_s_ex_vae": round(args.batch / t1, 4),
            "steps": args.steps,
            "size": args.size,
            "batch": args.batch,
            "weights": weights_note,
            "rows": rows,
        }

    for v in variants:
        lat_s, img_s, t_s = run(v)
        rel = float(np.linalg.norm(lat_s - lat1) / max(np.linalg.norm(lat1), 1e-12))
        mse = float(np.mean((img_s - img1) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        row = {
            "variant": v["name"],
            "latent_rel_error": round(rel, 6),
            "psnr_vs_exact_db": round(psnr, 2),
            "s_per_batch": round(t_s, 4),
            "img_per_s_ex_vae": round(args.batch / t_s, 4),
            "speedup_vs_exact": round(t1 / t_s, 4),
        }
        if v.get("sampler") == "dpm" and lat_dpm50 is not None:
            rel50 = float(np.linalg.norm(lat_s - lat_dpm50)
                          / max(np.linalg.norm(lat_dpm50), 1e-12))
            mse50 = float(np.mean((img_s - img_dpm50) ** 2))
            row["latent_rel_error_vs_dpm_converged"] = round(rel50, 6)
            row["psnr_vs_dpm_converged_db"] = round(
                10.0 * np.log10(1.0 / max(mse50, 1e-12)), 2)
        rows.append(row)
        print(json.dumps(rows[-1]))
        if args.out:  # incremental: a timeout loses one variant, not the run
            Path(args.out).write_text(json.dumps(table(), indent=1))

    print(json.dumps(table()))


if __name__ == "__main__":
    main()
