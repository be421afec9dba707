"""Optimizer + LR schedule.

Matches the reference:
  * AdamW, betas/weight-decay from config (diffusion_module.py:278-293)
  * LinearWarmupCosineAnnealingLR, EPOCH-granular: linear warmup from
    lr·0.01 over `warmup_epochs`, cosine anneal to `min_lr` at `max_epochs`
    (src/models/lr_scheduler.py:14-64, stepped per epoch)
  * per-group LRs: image projection and purifier at 2× base LR
    (diffusion_module_ip.py:500-519)
  * global-norm gradient clip (training_pipeline_ip.py:107 grad-clip 1.0)
"""

from __future__ import annotations

import math
import jax.numpy as jnp
import optax

from ..core.config import Config


def warmup_cosine_epochwise(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    min_lr: float = 1e-6,
    warmup_start_factor: float = 0.01,
):
    """Epoch-granular warmup→cosine, evaluated from the global step."""
    warmup_start = base_lr * warmup_start_factor

    def schedule(step):
        epoch = jnp.asarray(step) // max(steps_per_epoch, 1)
        epoch = jnp.minimum(epoch, max_epochs)
        warm_frac = jnp.clip(epoch / max(warmup_epochs, 1), 0.0, 1.0)
        warm_lr = warmup_start + (base_lr - warmup_start) * warm_frac
        t = jnp.clip(
            (epoch - warmup_epochs) / max(max_epochs - warmup_epochs, 1), 0.0, 1.0
        )
        cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * t))
        return jnp.where(epoch < warmup_epochs, warm_lr, cos_lr)

    return schedule


def _group_label(path_tuple) -> str:
    """2× LR for image projection and purifier, 1× for everything else."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path_tuple]
    if "image_projection" in keys or "feature_purifier" in keys:
        return "x2"
    return "x1"


def build_optimizer(cfg: Config, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    import jax

    opt = cfg.optimizer
    sch = cfg.scheduler
    base = warmup_cosine_epochwise(
        opt.lr,
        sch.warmup_epochs,
        cfg.training.max_epochs,
        steps_per_epoch,
        min_lr=sch.min_lr,
    )
    double = warmup_cosine_epochwise(
        opt.lr * 2,
        sch.warmup_epochs,
        cfg.training.max_epochs,
        steps_per_epoch,
        min_lr=sch.min_lr,
    )

    def adamw(schedule):
        return optax.adamw(
            learning_rate=schedule,
            b1=opt.betas[0],
            b2=opt.betas[1],
            weight_decay=opt.weight_decay,
        )

    tx = optax.multi_transform(
        {"x1": adamw(base), "x2": adamw(double)},
        param_labels=lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: _group_label(path), params
        ),
    )
    clip = cfg.training.gradient_clip_val
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    accum = getattr(cfg.training, "accumulate_grad_batches", 1) or 1
    if accum > 1:
        # Gradient accumulation (reference: Trainer(accumulate_grad_batches=k),
        # training_pipeline_ip.py:117): average grads over k micro-batches,
        # apply one optimizer step every k. Clipping sits INSIDE MultiSteps,
        # so — like Lightning — it clips the accumulated (averaged) gradient
        # at the real optimizer step, not each micro-gradient. The LR
        # schedule advances per OPTIMIZER step (MultiSteps only steps the
        # inner transform on apply), so `steps_per_epoch` passed here must
        # count optimizer steps (= batches_per_epoch // k).
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
