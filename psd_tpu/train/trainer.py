"""Train state + jitted, mesh-sharded train step.

TPU-native replacement for the reference's Lightning Trainer + DDP path
(training_pipeline_ip.py:103-123): data parallelism is expressed as batch
sharding over the `dp` mesh axis; XLA inserts the gradient all-reduce over
ICI (SURVEY.md §2.2). Optionally the parameters/optimizer state shard over
an `fsdp` axis (ZeRO-style) via psd_tpu.parallel.fsdp_param_spec.

The step donates the state buffers (in-place update on device) and keeps
everything except the loss on device — no host sync per step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.dadd import DADD
from ..parallel.mesh import batch_sharding, fsdp_param_spec
from .ema import EMAState, ema_init, ema_update
from .optim import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: EMAState


def create_train_state(
    dadd: DADD,
    rng: jax.Array,
    tx: Optional[optax.GradientTransformation] = None,
    image_size: Optional[int] = None,
    steps_per_epoch: int = 1000,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = tx or build_optimizer(dadd.cfg, steps_per_epoch)
    params = dadd.init_core(rng, image_size or dadd.cfg.dataset.image_size)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema=ema_init(params["params"]),
    )
    return state, tx


def make_train_step(dadd: DADD, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None):
    tcfg = dadd.cfg.training

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        from ..core.mode import training_mode

        # trace-time flag: kernel dispatch picks fused-backward
        # implementations for the fwd+bwd graph (core/mode.py)
        with training_mode():
            return _train_step_body(state, batch, rng)

    def _train_step_body(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            if mesh is not None and mesh.shape.get("fsdp", 1) > 1:
                # ZeRO-1 semantics: compute with gathered (replicated) params;
                # master params + optimizer state stay fsdp-sharded. XLA turns
                # this into one all-gather per weight on use and a
                # reduce-scatter on the gradient — and it keeps fsdp-sharded
                # weights out of the matmuls, where contracting-dim shardings
                # conflict with the batch sharding (the involuntary-full-
                # rematerialization warnings in MULTICHIP_r01).
                p = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P())
                    ),
                    p,
                )
            return dadd.train_loss({"params": p}, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"]
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        accum = getattr(tcfg, "accumulate_grad_batches", 1) or 1
        if accum > 1:
            # optax.MultiSteps: params change only on real optimizer steps.
            # EMA start/every count OPTIMIZER steps (Lightning global_step
            # semantics, ema_callback.py:414-472); on pure accumulation
            # micro-steps we pass step=-1 so ema_update's start-gate blocks.
            applied = new_opt.mini_step == 0
            ema_step = jnp.where(applied, new_opt.gradient_step - 1, -1)
        else:
            ema_step = state.step
        new_ema = ema_update(
            state.ema,
            new_params,
            ema_step,
            decay=tcfg.ema_decay,
            start_step=tcfg.update_starting_at_step,
            every=tcfg.update_every_n_steps,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params={"params": new_params},
            opt_state=new_opt,
            ema=new_ema,
        )
        return new_state, metrics

    return train_step


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the state on the mesh: tp-shard transformer kernels (tp>1),
    fsdp-shard the rest of params/opt/ema, replicate scalars."""
    from ..parallel.mesh import param_spec

    def place(path, x):
        if hasattr(x, "shape") and x.ndim >= 1:
            return jax.device_put(
                x, NamedSharding(mesh, param_spec(path, x.shape, mesh))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, state)


def compile_train_step(
    dadd: DADD,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """jit the step; with a mesh, constrain batch to dp-sharding."""
    step_fn = make_train_step(dadd, tx, mesh)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    bsh = batch_sharding(mesh)

    def sharded_step(state, batch, rng):
        from ..parallel.mesh import batch_sharding_scope

        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*([bsh.spec[0]] + [None] * (x.ndim - 1))))
            ),
            batch,
        )
        # the scope makes constrain_batch() calls inside the conditioning
        # path re-assert batch sharding (traced once, baked into the jaxpr)
        with batch_sharding_scope(mesh):
            return step_fn(state, batch, rng)

    return jax.jit(sharded_step, donate_argnums=(0,))
