"""LEACE-style linear disease erasure: fit + apply.

Capability match to scripts/compute_leace_projection.py:127-208 (fit) and
inference_pipeline_ip.py:24-57 (apply): flatten (T·D) image tokens,
between-class scatter of class-conditional means (rows weighted √n_k),
SVD → top-`rank` disease directions, null-space projection
P = I − V_r V_rᵀ; apply re-centers around the training mean.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def fit_leace(
    embeddings: np.ndarray,  # (N, T, D)
    labels: np.ndarray,  # (N,)
    rank: int = 1,
) -> Dict[str, np.ndarray]:
    N, T, D = embeddings.shape
    X = embeddings.reshape(N, T * D).astype(np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu

    uniq = np.unique(labels)
    means, counts = [], []
    for lbl in uniq:
        mask = labels == lbl
        means.append(Xc[mask].mean(axis=0))
        counts.append(int(mask.sum()))
    M = np.stack(means, axis=0)
    Mw = M * np.sqrt(np.asarray(counts, np.float64))[:, None]

    _, S, Vh = np.linalg.svd(Mw, full_matrices=False)
    mayo_dir = Vh[:rank].T  # (T·D, rank)
    P_null = np.eye(T * D) - mayo_dir @ mayo_dir.T

    # self-verification: inter-class mean distances must collapse
    def _max_pdist(A):
        d = np.linalg.norm(A[:, None, :] - A[None, :, :], axis=-1)
        return float(d.max())

    stats = {
        "dist_before": _max_pdist(M),
        "dist_after": _max_pdist(M @ P_null.T),
        "explained_variance": float((S[:rank] ** 2).sum() / (S**2).sum()),
    }
    return {
        "P_null": P_null.astype(np.float32),
        "mu": mu.astype(np.float32),
        "mayo_dir": mayo_dir.astype(np.float32),
        "rank": rank,
        "num_tokens": T,
        "token_dim": D,
        "stats": stats,
    }


def apply_leace(image_embeds: jnp.ndarray, leace: Dict) -> jnp.ndarray:
    """(B, T, D) → projected (B, T, D); matches _apply_leace."""
    B, T, D = image_embeds.shape
    P = jnp.asarray(leace["P_null"], image_embeds.dtype)
    mu = jnp.asarray(leace["mu"], image_embeds.dtype)
    flat = image_embeds.reshape(B, T * D)
    clean = (flat - mu) @ P.T + mu
    return clean.reshape(B, T, D)


def save_leace(leace: Dict, path) -> None:
    np.savez(path, **{k: v for k, v in leace.items() if k != "stats"})


def load_leace(path) -> Dict:
    data = dict(np.load(path))
    data["rank"] = int(data["rank"])
    data["num_tokens"] = int(data["num_tokens"])
    data["token_dim"] = int(data["token_dim"])
    return data
