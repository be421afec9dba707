"""Training pipeline CLI — TPU counterpart of
src/pipelines/training/training_pipeline_ip.py.

Flow: load YAML config (+dotted overrides) → build DADD + mesh → data
loader → jitted sharded train step (loss/grads/AdamW/EMA in one compiled
program) → periodic metric logging + async Orbax checkpoints → resume from
"last" or an explicit path.

The frozen VAE/CLIP encode runs per batch on device as a separate jitted
fn so the UNet step stays donate-buffer clean. W&B logging is optional
(falls back to JSONL metrics when wandb/offline unavailable).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, load_config
from ..data.limuc import AugmentConfig, DataLoader, LIMUCDataset
from .common import build_model
from ..parallel.mesh import MeshConfig, create_mesh, shard_batch
from ..train import (
    CheckpointManager,
    build_optimizer,
    compile_train_step,
    create_train_state,
    shard_train_state,
)
from ..utils.fast_init import enable_compile_cache
from ..utils.logging import MetricLogger


def build_argparser():
    p = argparse.ArgumentParser(description="DADD training (TPU)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    p.add_argument("--output-dir", type=str, default="runs/train")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (smoke runs)")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--vae-params", type=str, default=None, help=".npz ported VAE")
    p.add_argument("--clip-params", type=str, default=None, help=".npz ported CLIP")
    from .common import add_profile_arg

    add_profile_arg(p)
    return p


def main(argv=None):
    # intermixed: dotted overrides may appear anywhere among flags
    args = build_argparser().parse_intermixed_args(argv)
    cfg = load_config(args.config, overrides=args.overrides)
    enable_compile_cache()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(out_dir / "metrics.jsonl", wandb_cfg=cfg.wandb)

    mesh = create_mesh(MeshConfig(dp=args.dp, fsdp=args.fsdp))
    model = build_model(cfg)

    # data
    aug = AugmentConfig(**{
        k: v for k, v in cfg.dataset.augmentation.items()
        if k in AugmentConfig.__dataclass_fields__
    })
    ds = LIMUCDataset(
        Path(cfg.dataset.dataset_path) / "train",
        image_size=cfg.dataset.image_size,
        augment=aug,
        return_clip=True,
        clip_size=model.clip_cfg.image_size,
        seed=cfg.training.seed,
    )
    loader = DataLoader(
        ds,
        batch_size=cfg.dataset.batch_size,
        class_balanced=cfg.dataset.sampler == "class_balanced",
        num_threads=cfg.dataset.num_workers,
        seed=cfg.training.seed,
    )
    steps_per_epoch = max(len(loader), 1)
    # the LR schedule advances per OPTIMIZER step; with gradient accumulation
    # one epoch contains len(loader)//k of those (optim.py build_optimizer)
    accum = max(cfg.training.accumulate_grad_batches or 1, 1)
    opt_steps_per_epoch = max(steps_per_epoch // accum, 1)

    # frozen encoders
    rng = jax.random.PRNGKey(cfg.training.seed)
    if args.vae_params:
        from ..convert.io import load_params_npz

        vae_params = load_params_npz(args.vae_params)
    else:
        vae_params = model.vae.init(
            rng, jnp.zeros((1, cfg.dataset.image_size, cfg.dataset.image_size, 3)),
            jax.random.PRNGKey(1),
        )
    if args.clip_params:
        from ..convert.io import load_params_npz

        clip_params = load_params_npz(args.clip_params)
    else:
        clip_params = model.clip.init(
            rng, jnp.zeros((1, model.clip_cfg.image_size,
                            model.clip_cfg.image_size, 3))
        )

    def encode_batch(images, clip_images, key):
        # DADD's encode fns are cached jits taking frozen params as args
        latents = model.encode_latents(vae_params, images, key)
        clip_feats = model.encode_image_clip(clip_params, clip_images)
        return latents, clip_feats

    # train state
    tx = build_optimizer(cfg, opt_steps_per_epoch)
    state, tx = create_train_state(model, rng, tx=tx,
                                   image_size=cfg.dataset.image_size)
    ckpt = CheckpointManager(out_dir / "checkpoints")
    if cfg.training.resume_checkpoint:
        from ..train.checkpoint import resolve_resume_path

        path = resolve_resume_path(cfg.training.resume_checkpoint,
                                   out_dir / "checkpoints")
        mgr = ckpt if path == out_dir / "checkpoints" else CheckpointManager(path)
        state = mgr.restore(jax.tree_util.tree_map(np.asarray, state))
        print(f"Resumed from {path} at step {int(state.step)}")

    state = shard_train_state(state, mesh)
    step_fn = compile_train_step(model, tx, mesh)

    total_steps = args.max_steps or steps_per_epoch * cfg.training.max_epochs
    log_every = cfg.training.log_every_n_steps
    step = int(state.step)
    t0 = time.perf_counter()
    train_rng = jax.random.PRNGKey(cfg.training.seed + 17)

    # static routing-gate values (the reference logs these per epoch,
    # diffusion_module_ip.py:464-498; ours are static config — log once)
    if cfg.model.use_routing_gates:
        gates = {
            "gates/anatomy_anat": cfg.model.gate_init_anatomy[0],
            "gates/anatomy_dis": cfg.model.gate_init_anatomy[1],
            "gates/disease_anat": cfg.model.gate_init_disease[0],
            "gates/disease_dis": cfg.model.gate_init_disease[1],
        }
        logger.log({"step": 0, **gates})

    def _embed_stats_fn(p):
        return model.core.apply(
            p, method=lambda m: m.ordinal_embedder.embedding_stats()
        )

    embed_stats_jit = jax.jit(_embed_stats_fn)

    # ---- validation / monitoring (EMA-swap, ema_callback.py:168-230) ----
    val_dir = Path(cfg.dataset.dataset_path) / "val"
    val_ds = None
    if val_dir.exists() and cfg.training.check_val_every_n_epochs > 0:
        val_ds = LIMUCDataset(
            val_dir, image_size=cfg.dataset.image_size, return_clip=True,
            clip_size=model.clip_cfg.image_size, seed=cfg.training.seed,
        )
    val_loss_jit = jax.jit(lambda p, b, r: model.train_loss(p, b, r))
    sample_dir = out_dir / "val_samples"

    def run_validation(state, epoch, step):
        """EMA-swapped val loss + a fixed progression grid each val epoch."""
        ema_active = int(jax.device_get(state.ema.count)) > 0
        p = {"params": state.ema.params} if ema_active else state.params
        records = {"step": step, "epoch": epoch, "val/ema_swapped": ema_active}
        if val_ds is not None:
            losses = []
            vloader = DataLoader(
                val_ds, batch_size=cfg.dataset.batch_size, shuffle=False,
                class_balanced=False, drop_last=False,
                num_threads=cfg.dataset.num_workers, seed=0,
            )
            from .common import pad_batch

            for i, vb in enumerate(vloader):
                if i >= cfg.training.val_max_batches:
                    break
                (img, cimg, lbl), _ = pad_batch(
                    [vb["image"], vb["clip_image"], vb["label"]],
                    cfg.dataset.batch_size,
                )
                latents, clip_feats = encode_batch(
                    jnp.asarray(img), jnp.asarray(cimg), jax.random.PRNGKey(11)
                )
                vbatch = {"latents": latents, "labels": jnp.asarray(lbl),
                          "clip_feats": clip_feats}
                # fixed key → deterministic val noise/timesteps across epochs
                loss, _ = val_loss_jit(p, vbatch, jax.random.fold_in(
                    jax.random.PRNGKey(1234), i))
                losses.append(float(loss))
            if losses:
                records["val/loss"] = float(np.mean(losses))
        # fixed-source progression grid (sample-quality monitoring)
        if val_ds is not None and cfg.training.val_progression_levels > 0:
            from ..utils.image_io import progression_grid

            item = val_ds.load(0)
            K = cfg.training.val_progression_levels
            levels = np.linspace(0, cfg.dataset.num_classes - 1, K)
            clip_feats = model.encode_image_clip(
                clip_params, jnp.asarray(np.stack([item["clip_image"]] * K))
            )
            cond = model.prepare_inference_cond(
                p, jnp.asarray(levels, jnp.float32),
                jnp.full((K,), item["label"], jnp.float32), clip_feats,
            )
            lat = model.sample(
                p, cond, jax.random.PRNGKey(99),
                image_size=cfg.dataset.image_size,
                sampling_steps=cfg.training.val_sampling_steps,
                steer_scale=1.0 if cfg.model.use_routing_gates else 0.0,
                shared_noise=True,
            )
            imgs = np.asarray(model.decode_latents(vae_params, lat))
            sample_dir.mkdir(parents=True, exist_ok=True)
            progression_grid(
                imgs, list(levels), sample_dir / f"epoch{epoch:04d}.png",
            )
            records["val/progression_png"] = str(
                sample_dir / f"epoch{epoch:04d}.png")
        logger.log(records)
        if "val/loss" in records:
            print(f"epoch {epoch} val: loss={records['val/loss']:.4f} "
                  f"(ema={ema_active})")

    print(f"Training: {total_steps} steps, {steps_per_epoch} steps/epoch, "
          f"mesh={dict(mesh.shape)}")
    # --profile: jax.profiler trace over the run (pair with --max-steps to
    # bound the trace) + per-phase wall-clock report at exit (SURVEY §5)
    import contextlib

    from ..utils.profiling import PhaseTimer, trace_if

    timer = PhaseTimer()
    prof_stack = contextlib.ExitStack()
    if args.profile:
        prof_stack.enter_context(
            trace_if(str(out_dir / "trace"), enabled=True))
    done = False
    t_iter = time.perf_counter()
    while not done:
        for batch in loader:
            if args.profile:
                timer.totals["data"] += time.perf_counter() - t_iter
                timer.counts["data"] += 1
            images = jnp.asarray(batch["image"])
            clip_images = jnp.asarray(batch["clip_image"])
            labels = jnp.asarray(batch["label"])
            enc_key = jax.random.fold_in(jax.random.PRNGKey(7), step)
            with timer.phase("encode"):
                latents, clip_feats = encode_batch(images, clip_images, enc_key)
            dev_batch = shard_batch(mesh, {
                "latents": latents, "labels": labels, "clip_feats": clip_feats,
            })
            with timer.phase("train_step"):
                state, metrics = step_fn(state, dev_batch, train_rng)
                if args.profile:
                    # sync: attribute device time to the step, not the log
                    np.asarray(metrics["loss"])
            step += 1
            if step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["img_per_sec"] = (
                    log_every * cfg.dataset.batch_size / (time.perf_counter() - t0)
                )
                t0 = time.perf_counter()
                # AOE embedding statistics (reference: every 500 steps,
                # diffusion_module.py:267-271) folded into the log cadence
                if step % max(log_every * 10, 500) < log_every:
                    stats = embed_stats_jit(state.params)
                    m.update({k: float(v) for k, v in stats.items()})
                logger.log(m)
                print(f"step {step}: loss={m['loss']:.4f} "
                      f"({m['img_per_sec']:.1f} img/s)")
            if step % steps_per_epoch == 0:
                with timer.phase("checkpoint"):
                    ckpt.save(step, jax.device_get(state))
                epoch = step // steps_per_epoch
                if (val_ds is not None
                        and epoch % cfg.training.check_val_every_n_epochs == 0):
                    with timer.phase("validation"):
                        run_validation(state, epoch, step)
            if step >= total_steps:
                done = True
                break
            t_iter = time.perf_counter()
    prof_stack.close()
    if ckpt.latest_step() != step:
        ckpt.save(step, jax.device_get(state), force=True)
    ckpt.wait()
    logger.close()
    if args.profile:
        print(f"[profile] trace → {out_dir / 'trace'}\n{timer.report()}")
    print(f"Done at step {step}; checkpoints in {out_dir / 'checkpoints'}")
    return state


if __name__ == "__main__":
    main()
