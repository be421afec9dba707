"""Improved Precision & Recall (Kynkäänniemi et al., arXiv:1904.06991).

Capability match to evaluation_pipeline.py:741-793: per-set manifolds are
unions of hyperspheres with radius = distance to the k-th nearest neighbour
within the same set (k=3); precision = fraction of fake samples inside the
real manifold, recall = fraction of real samples inside the fake manifold.
Features in the reference are VGG16 fc7 (4096-d, psd_tpu.models.vgg).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cmmd import _sq_dists


def _knn_radii(feats: jnp.ndarray, k: int) -> jnp.ndarray:
    """Distance to the k-th NN within the set (excluding self)."""
    d2 = _sq_dists(feats, feats)
    # k+1 smallest includes the zero self-distance
    neg_topk = jax.lax.top_k(-d2, k + 1)[0]
    return jnp.sqrt(jnp.maximum(-neg_topk[:, -1], 0.0))


def improved_precision_recall(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    k: int = 3,
) -> Tuple[float, float]:
    n, m = len(real_feats), len(fake_feats)
    if n < k + 1 or m < k + 1:
        return -1.0, -1.0

    @jax.jit
    def _compute(real, fake):
        real_r = _knn_radii(real, k)
        fake_r = _knn_radii(fake, k)
        cross = jnp.sqrt(_sq_dists(fake, real))  # (M, N)
        precision = (cross <= real_r[None, :]).any(axis=1).astype(jnp.float32).mean()
        recall = (cross.T <= fake_r[None, :]).any(axis=1).astype(jnp.float32).mean()
        return precision, recall

    p, r = _compute(jnp.asarray(real_feats, jnp.float32),
                    jnp.asarray(fake_feats, jnp.float32))
    return float(p), float(r)
