"""MES progression inference CLI.

Capability match to src/pipelines/inference/inference_pipeline_ip.py:
generate a progression of `--mes-steps` severity levels (linspace 0→3) for
one structure image, with shared initial noise across levels, single-pass
delta steering (`--steer-scale`) in routing-gates mode or dual-pass CFG
with negative-AOE unconditional in baseline mode (`--guidance-scale`),
`--image-scale`, `--zero-image`, `--leace`, `--eta`, x0-clamp ±4.

Differences by design (TPU-first): the whole progression batch is ONE
jitted device computation (the 50-step loop is a lax.scan; cond/uncond CFG
is a fused 2× batch), and steer/guidance scales are traced scalars rather
than module-state mutation.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..conditioning.leace import load_leace
from ..core.config import Config, load_config
from ..diffusion.dadd import DADD
from .common import build_model
from ..utils.image_io import progression_grid, save_sequence


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DADD MES progression inference (TPU)")
    p.add_argument("--config", type=str, default=None, help="training YAML config")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax checkpoint dir (None → random init smoke mode)")
    p.add_argument("--structure-image", type=str, required=True)
    p.add_argument("--source-label", type=float, default=0.0)
    p.add_argument("--mes-steps", type=int, default=13)
    p.add_argument("--mes-start", type=float, default=0.0)
    p.add_argument("--mes-end", type=float, default=3.0)
    p.add_argument("--sampling-steps", type=int, default=None)
    p.add_argument("--steer-scale", type=float, default=0.0)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--image-scale", type=float, default=1.0)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--zero-image", action="store_true")
    p.add_argument("--leace", type=str, default=None, help=".npz LEACE projection")
    p.add_argument("--ema", action="store_true", help="sample with EMA weights")
    p.add_argument("--device", type=str, default="auto",
                   help="accepted for reference-CLI compatibility; device "
                        "selection is JAX-platform-driven here")
    p.add_argument("--output-dir", type=str, default="outputs/progression")
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    from .common import add_profile_arg, add_turbo_args

    add_turbo_args(p)
    add_profile_arg(p)
    return p


def load_structure_image(path: str | Path, target_size: int, clip_size: int = 224):
    """PIL load → display tensor [0,1] at target size + CLIP pixel values.

    Mirrors _load_and_preprocess_structure_image
    (inference_pipeline_ip.py:198-229): display resize first, CLIP
    preprocessing applied to the resized image.
    """
    from transformers import CLIPImageProcessor

    pil = Image.open(path).convert("RGB")
    display = pil.resize((target_size, target_size), Image.BILINEAR)
    display_arr = np.asarray(display, np.float32) / 255.0

    proc = CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": clip_size},
        do_center_crop=True,
        crop_size={"height": clip_size, "width": clip_size},
        do_rescale=True,
        do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )
    clip = proc(images=display, return_tensors="np").pixel_values[0]
    clip_nhwc = np.transpose(clip, (1, 2, 0)).astype(np.float32)
    return clip_nhwc[None], display_arr


def load_params(model: DADD, checkpoint: str | None, seed: int, image_size: int,
                use_ema: bool = False):
    """Load core params (+frozen VAE/CLIP) from an orbax dir or random-init."""
    rng = jax.random.PRNGKey(seed)
    core = model.init_core(rng, image_size=image_size)
    vae = model.vae.init(
        jax.random.PRNGKey(seed + 1),
        jnp.zeros((1, image_size, image_size, 3)),
        jax.random.PRNGKey(seed + 2),
    )
    clip = model.clip.init(
        jax.random.PRNGKey(seed + 3),
        jnp.zeros((1, model.clip_cfg.image_size, model.clip_cfg.image_size, 3)),
    )
    if checkpoint:
        from ..train.checkpoint import CheckpointManager
        from ..train.trainer import TrainState
        from ..train.optim import build_optimizer

        tx = build_optimizer(model.cfg)
        template = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(np.asarray, core),
            opt_state=tx.init(core["params"]),
            ema=__import__("psd_tpu.train.ema", fromlist=["ema_init"]).ema_init(
                core["params"]
            ),
        )
        mgr = CheckpointManager(checkpoint)
        state = mgr.restore(template)
        mgr.close()
        core = (
            {"params": state.ema.params} if use_ema else {"params": state.params["params"]}
        )
        # frozen encoder weights ship separately (convert/ports); if the
        # checkpoint dir contains them, prefer those
        enc_dir = Path(checkpoint) / "frozen"
        if (enc_dir / "vae.npz").exists():
            from ..convert.io import load_params_npz

            vae = load_params_npz(enc_dir / "vae.npz")
        if (enc_dir / "clip.npz").exists():
            from ..convert.io import load_params_npz

            clip = load_params_npz(enc_dir / "clip.npz")
    return core, vae, clip


def main(argv=None) -> dict:
    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config) if args.config else Config()
    image_size = args.image_size or cfg.dataset.image_size
    steps = args.sampling_steps or cfg.diffusion.sampling_steps
    out_dir = Path(args.output_dir)

    model = build_model(cfg, args.dtype, tome_ratio=args.tome_ratio,
                        tome_mode=args.tome_mode, vae_quant=args.vae_quant)
    core, vae_params, clip_params = load_params(
        model, args.checkpoint, args.seed, image_size, args.ema
    )

    clip_img, display = load_structure_image(
        args.structure_image, image_size, clip_size=model.clip_cfg.image_size
    )
    leace = load_leace(args.leace) if args.leace else None

    targets = jnp.linspace(args.mes_start, args.mes_end, args.mes_steps)
    sources = jnp.full((args.mes_steps,), args.source_label)

    use_rg = model.core_cfg.use_routing_gates
    guidance = 1.0 if use_rg else args.guidance_scale  # RG mode forces 1.0
    do_cfg = (not use_rg) and guidance != 1.0
    if args.encoder_stride > 1 and do_cfg:
        raise SystemExit(
            "--encoder-stride > 1 is incompatible with dual-pass CFG "
            f"(baseline mode, --guidance-scale {args.guidance_scale}): the "
            "cached encoder features are conditioning-dependent. Use "
            "--guidance-scale 1 or a routing-gates checkpoint."
        )

    from ..utils.profiling import PhaseTimer, trace_if

    timer = PhaseTimer()
    t0 = time.perf_counter()
    with trace_if(str(out_dir / "trace"), enabled=args.profile):
        with timer.phase("clip_encode"):
            clip_feats = model.encode_image_clip(clip_params, jnp.asarray(clip_img))
            clip_feats = jnp.tile(
                clip_feats, (args.mes_steps,) + (1,) * (clip_feats.ndim - 1))

        with timer.phase("prepare_cond", sync_value=None):
            cond = model.prepare_inference_cond(
                core, targets, sources, clip_feats,
                image_scale=args.image_scale, zero_image=args.zero_image,
                leace=leace,
            )
            uncond = None
            if do_cfg:
                uncond = model.prepare_inference_cond(
                    core, targets, sources, clip_feats,
                    image_scale=args.image_scale, zero_image=args.zero_image,
                    zero_aoe=True, leace=leace,
                )

        key = jax.random.PRNGKey(args.seed)
        with timer.phase("generate"):
            images = np.asarray(model.generate(
                core, vae_params, cond, key,
                image_size=image_size, sampling_steps=steps, eta=args.eta,
                steer_scale=args.steer_scale if use_rg else 0.0,
                guidance_scale=guidance, cond_uncond=uncond,
                shared_noise=True,
                eta_key=jax.random.fold_in(key, 1) if args.eta > 0 else None,
                encoder_stride=args.encoder_stride,
                cache_mode=args.cache_mode,
                sampler=args.sampler,
            ))
            jax.block_until_ready(images)
    dt = time.perf_counter() - t0

    labels = np.asarray(targets)
    paths = save_sequence(images, labels, out_dir)
    grid = progression_grid(images, labels, out_dir / "progression_grid.png",
                            reference=display)
    # structure reference alongside the mes_*.png outputs — consumed by the
    # paper-figure "reference" mode (scripts/create_paper_figure.py)
    from ..utils.image_io import save_image

    save_image(np.asarray(display), out_dir / "structure_reference.png")
    print(
        f"Generated {args.mes_steps}-step progression in {dt:.2f}s "
        f"({args.mes_steps / dt:.2f} img/s) → {out_dir}"
    )
    if args.profile:
        print(f"[profile] trace → {out_dir / 'trace'}\n{timer.report()}")
    return {"paths": paths, "grid": grid, "seconds": dt, "images": images}


if __name__ == "__main__":
    main()
