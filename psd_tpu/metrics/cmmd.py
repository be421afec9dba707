"""CMMD: CLIP-feature MMD² with a sum of RBF kernels (unbiased estimator).

Capability match to evaluation_pipeline.py:602-701: features are
L2-normalized CLIP ViT-L/14 projected embeddings (our CLIPVisionTower
image_embeds == HF visual_projection(pooler_output)); kernel bandwidths
σ ∈ {0.1, 1, 10, 100} with k(x,y) = exp(−‖x−y‖² / (2σ²)); unbiased
diagonal-removed estimator, summed over bandwidths. Kernel sums run as one
jitted device computation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SIGMAS = (0.1, 1.0, 10.0, 100.0)


def l2_normalize(feats: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), eps)


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    d2 = a2 + b2 - 2.0 * (a @ b.T)
    return jnp.maximum(d2, 0.0)


def mmd2_rbf(
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
) -> jnp.ndarray:
    """Unbiased multi-bandwidth MMD² between (N,D) and (M,D) features."""
    n, m = x.shape[0], y.shape[0]
    if n < 2 or m < 2:
        return jnp.asarray(-1.0)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = _sq_dists(x, x)
    yy = _sq_dists(y, y)
    xy = _sq_dists(x, y)

    total = jnp.asarray(0.0)
    for sigma in sigmas:
        gamma = 1.0 / (2.0 * sigma**2)
        kxx = jnp.exp(-gamma * xx)
        kyy = jnp.exp(-gamma * yy)
        kxy = jnp.exp(-gamma * xy)
        kxx_sum = (kxx.sum() - jnp.trace(kxx)) / (n * (n - 1))
        kyy_sum = (kyy.sum() - jnp.trace(kyy)) / (m * (m - 1))
        total = total + kxx_sum + kyy_sum - 2.0 * kxy.sum() / (n * m)
    return total


def compute_cmmd(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    sigmas: Sequence[float] = DEFAULT_SIGMAS,
) -> float:
    """Features must be the L2-normalized CLIP projected embeddings."""
    fn = jax.jit(lambda a, b: mmd2_rbf(a, b, sigmas))
    return float(fn(jnp.asarray(real_feats), jnp.asarray(fake_feats)))
