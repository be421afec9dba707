"""DDPM noise schedule, q-sample, and min-SNR weighting.

Semantics match the reference (src/models/diffusion_module.py:140-193,
diffusion_module_ip.py:274-313): linear beta schedule, cumulative alphas,
SNR = acp/(1-acp+1e-8), min-SNR-γ loss weight min(SNR,γ)/(SNR+1e-8).

All buffers are fp32 numpy at construction (host) and jnp on use; the
schedule is static so it constant-folds under jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    kind: str = "linear"

    betas: np.ndarray = field(init=False, repr=False, compare=False)
    alphas_cumprod: np.ndarray = field(init=False, repr=False, compare=False)
    alphas_cumprod_prev: np.ndarray = field(init=False, repr=False, compare=False)
    snr: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        if self.kind != "linear":
            raise NotImplementedError(f"Only linear schedule supported, got {self.kind}")
        betas = np.linspace(
            self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float32
        )
        acp = np.cumprod((1.0 - betas).astype(np.float64), axis=0).astype(np.float32)
        acp_prev = np.concatenate([np.ones(1, np.float32), acp[:-1]])
        snr = acp / (1.0 - acp + 1e-8)
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "alphas_cumprod", acp)
        object.__setattr__(self, "alphas_cumprod_prev", acp_prev)
        object.__setattr__(self, "snr", snr)

    def q_sample(self, x0, t, noise):
        """x_t = sqrt(acp_t)·x0 + sqrt(1−acp_t)·noise, t: (B,) int."""
        acp = jnp.asarray(self.alphas_cumprod)[t].astype(x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(acp).reshape(shape) * x0
            + jnp.sqrt(1.0 - acp).reshape(shape) * noise
        )

    def min_snr_weight(self, t, gamma: float = 1.0):
        """min(SNR_t, γ) / (SNR_t + 1e-8); per-sample loss weight."""
        snr = jnp.asarray(self.snr)[t]
        return jnp.minimum(snr, gamma) / (snr + 1e-8)


def ddim_timesteps(num_train_timesteps: int, sampling_steps: int) -> np.ndarray:
    """DDIM timestep grid: linspace(T−1 → 0), truncated to int.

    Matches torch.linspace(T-1, 0, steps, dtype=long) in the reference
    (inference_pipeline_ip.py:390-396): compute in float64, cast truncates
    toward zero.
    """
    if sampling_steps > num_train_timesteps:
        raise ValueError(
            f"sampling_steps={sampling_steps} must be <= T={num_train_timesteps}"
        )
    vals = np.linspace(num_train_timesteps - 1, 0, sampling_steps, dtype=np.float64)
    return vals.astype(np.int64)
