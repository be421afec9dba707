"""EMA of trainable parameters as a pure pytree update.

Matches the reference's EMAWeightAveraging callback semantics
(src/callbacks/ema_callback.py:414-472): decay 0.999, updates start at
`update_starting_at_step` and happen every `update_every_n_steps`; the first
update initializes the average with a straight copy (torch AveragedModel
behavior with n_averaged==0). Unlike the reference's callback (which
"assumes no sharded models", ema_callback.py:60-61), a pytree EMA is
sharding-transparent: it inherits whatever sharding the params carry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    count: jnp.ndarray  # number of EMA updates applied (0 → uninitialized)


def ema_init(params, dtype=None) -> EMAState:
    """dtype=jnp.bfloat16 halves EMA HBM (useful for single-chip SD-scale
    training where fp32 AdamW state + params + EMA exceed 16 GB)."""
    def _cp(x):
        if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return jnp.copy(x)

    return EMAState(
        params=jax.tree_util.tree_map(_cp, params),
        count=jnp.zeros((), jnp.int32),
    )


def ema_update(
    state: EMAState,
    params,
    step: jnp.ndarray,
    decay: float = 0.999,
    start_step: int = 100,
    every: int = 4,
) -> EMAState:
    """Conditionally fold `params` into the average at this step."""
    do = jnp.logical_and(step >= start_step, (step - start_step) % every == 0)
    first = state.count == 0

    def blend(avg, p):
        p = p.astype(avg.dtype)
        new_avg = jnp.where(first, p, decay * avg + (1.0 - decay) * p)
        return jnp.where(do, new_avg, avg)

    new_params = jax.tree_util.tree_map(blend, state.params, params)
    new_count = state.count + jnp.where(do, 1, 0)
    return EMAState(params=new_params, count=new_count)
