"""Ordinal embedders: AOE (additive) and BOE (basic).

Semantics match src/models/ordinal_embedder.py:
  * AOE class table: E[k] = base + cumsum(deltas)[:k]  (:107-127)
  * monotonic init: deltas[i] ~ N(delta_scale, init_std) · (1 + 0.1·i)  (:92-105)
  * continuous-label linear interpolation with clamping  (:155-171)
  * train-time gaussian regularization noise σ=0.005  (:173-175)
  * projector MLP D→2D→GELU→D·T, reshaped to T tokens  (:80-85,177-178);
    the reference also defines a LayerNorm(D·T) that is NEVER applied
    (:85) — we do not create that dead parameter.
  * learnable null embedding, returned unprojected as (B, D)  (:87-90,146-148)
  * negative embedding via smooth clamp(1−y, 0, 1)  (:182-221)
  * delta embedding proj(E[t]) − proj(E[s]), subtracted AFTER projection so
    biases cancel (:246-294)

BOE is re-specified from intent (the reference imports but never defines it,
SURVEY.md §0.1): a plain per-class table with the same interpolation,
returning (B, D) unprojected embeddings for the base ordinal-only module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.layers import gelu


def _interp_table(table: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of rows of (K, D) table at float labels (B,)."""
    K = table.shape[0]
    y = jnp.clip(labels.astype(table.dtype), 0.0, float(K - 1))
    lower = jnp.floor(y)
    upper = jnp.minimum(lower + 1, K - 1).astype(jnp.int32)
    alpha = (y - lower)[:, None]
    lo = table[lower.astype(jnp.int32)]
    hi = table[upper]
    return lo * (1.0 - alpha) + hi * alpha


class AdditiveOrdinalEmbedder(nn.Module):
    num_classes: int = 4
    embedding_dim: int = 768
    init_std: float = 0.02
    delta_scale: float = 0.1
    num_tokens: int = 16
    noise_std: float = 0.005
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.num_classes < 2:
            raise ValueError("num_classes must be >= 2 for ordinal modeling.")
        D, K = self.embedding_dim, self.num_classes

        self.base = self.param("base", nn.initializers.normal(self.init_std), (D,))

        def delta_init(key, shape, dtype=jnp.float32):
            noise = self.init_std * jax.random.normal(key, shape, dtype)
            rows = (self.delta_scale + noise) * (
                1.0 + 0.1 * jnp.arange(K - 1, dtype=dtype)[:, None]
            )
            return rows

        self.deltas = self.param("deltas", delta_init, (K - 1, D))
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.proj_1 = nn.Dense(D * 2, name="projector_0", **kw)
        self.proj_2 = nn.Dense(D * self.num_tokens, name="projector_2", **kw)
        self.null_embedding = self.param(
            "null_embedding", nn.initializers.zeros, (1, D)
        )

    def class_table(self) -> jnp.ndarray:
        offsets = jnp.concatenate(
            [jnp.zeros((1, self.embedding_dim), self.deltas.dtype),
             jnp.cumsum(self.deltas, axis=0)],
            axis=0,
        )
        return self.base[None, :] + offsets

    def _project(self, emb: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.mesh import constrain_batch

        h = self.proj_1(emb)
        h = gelu(h)
        h = self.proj_2(h)
        out = h.reshape(-1, self.num_tokens, self.embedding_dim)
        # GSPMD loses the batch spec through this reshape on a dp×fsdp mesh
        # (involuntary full remat, MULTICHIP_r01); re-assert it when a
        # batch_sharding_scope is active.
        return constrain_batch(out)

    def __call__(
        self,
        labels: jnp.ndarray,
        is_training: bool = False,
        unconditional: bool = False,
        rng=None,
    ) -> jnp.ndarray:
        """labels: (B,) float in [0, K−1] → (B, T, D); unconditional → (B, D)."""
        if unconditional:
            B = labels.shape[0]
            return jnp.broadcast_to(self.null_embedding, (B, self.embedding_dim))
        out = _interp_table(self.class_table(), labels)
        if is_training and self.noise_std > 0:
            if rng is None:
                rng = self.make_rng("noise")
            out = out + self.noise_std * jax.random.normal(rng, out.shape, out.dtype)
        return self._project(out)

    def negative(self, labels, is_training: bool = False, rng=None):
        """Smooth negative conditioning: labels → clamp(1−y, 0, 1)."""
        neg = jnp.clip(1.0 - labels, 0.0, 1.0)
        return self(neg, is_training=is_training, rng=rng)

    def ordinal_delta(self, source_labels, target_labels):
        """proj(E[target]) − proj(E[source]); exactly zero when equal."""
        table = self.class_table()
        src = self._project(_interp_table(table, source_labels))
        tgt = self._project(_interp_table(table, target_labels))
        return tgt - src

    def disease_delta(self, source_labels):
        """Pure disease component: proj(E[source]) − proj(E[0]) negated →
        matches reference get_disease_delta_embedding (target = 0)."""
        return self.ordinal_delta(source_labels, jnp.zeros_like(source_labels))

    def embedding_stats(self):
        table = self.class_table()
        return {
            "embed/mean": table.mean(),
            "embed/std": table.std(),
            "embed/min": table.min(),
            "embed/max": table.max(),
            "embed/norm": jnp.linalg.norm(table, axis=-1).mean(),
            "embed/base_norm": jnp.linalg.norm(self.base),
            "embed/delta_mean": self.deltas.mean(),
            "embed/delta_std": self.deltas.std(),
        }


class BasicOrdinalEmbedder(nn.Module):
    """BOE: learnable per-class table + interpolation, (B,) → (B, D).

    Re-specified from the reference's intent (diffusion_module.py:84-96);
    the class itself is missing from the reference tree (SURVEY.md §0.1).
    """

    num_classes: int = 4
    embedding_dim: int = 768
    init_std: float = 0.02
    noise_std: float = 0.005
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.num_classes < 2:
            raise ValueError("num_classes must be >= 2 for ordinal modeling.")
        self.table = self.param(
            "table",
            nn.initializers.normal(self.init_std),
            (self.num_classes, self.embedding_dim),
        )
        self.null_embedding = self.param(
            "null_embedding", nn.initializers.zeros, (1, self.embedding_dim)
        )

    def __call__(self, labels, is_training: bool = False,
                 unconditional: bool = False, rng=None):
        if unconditional:
            B = labels.shape[0]
            return jnp.broadcast_to(self.null_embedding, (B, self.embedding_dim))
        out = _interp_table(self.table, labels)
        if is_training and self.noise_std > 0:
            if rng is None:
                rng = self.make_rng("noise")
            out = out + self.noise_std * jax.random.normal(rng, out.shape, out.dtype)
        return out
