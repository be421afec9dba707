"""Mixed-precision policy for TPU.

The reference trains with AMP fp16 ("16-mixed", configs/train_ip.yaml:78).
On TPU the idiomatic equivalent is bf16 compute with fp32 parameters/master
weights: matmuls and convs hit the MXU at bf16 throughput while optimizer
state and normalization statistics stay fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for softmax / normalization internals regardless of compute
    accum_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        import jax

        return jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_from_precision(precision: str) -> Policy:
    """Map reference-style precision strings to TPU policies."""
    p = str(precision)
    if p in ("32", "32-true", "fp32"):
        return FP32_POLICY
    # "16-mixed" (reference), "bf16-mixed", "bf16" → bf16 compute on TPU
    return DEFAULT_POLICY
