"""Auxiliary losses.

`orthogonal_loss` matches the reference's compute_orthogonal_loss
(src/models/losses.py:11-32): mean-pool each token set, squared cosine
similarity between the pooled vectors. Defined (and tested) but, exactly
like the reference, NOT wired into the default training objective — it is
available via the `aux_losses` hook for experiments.
"""

from __future__ import annotations

import jax.numpy as jnp


def orthogonal_loss(tokens_a: jnp.ndarray, tokens_b: jnp.ndarray,
                    eps: float = 1e-8) -> jnp.ndarray:
    """(B, Na, D), (B, Nb, D) → scalar mean squared cosine similarity."""
    a = tokens_a.mean(axis=1)
    b = tokens_b.mean(axis=1)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    cos = jnp.sum(a * b, axis=-1)
    return jnp.mean(cos**2)
