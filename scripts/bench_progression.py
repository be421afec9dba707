"""p50 latency of one 13-level MES progression (BASELINE.md tracked metric).

The reference's flagship inference call: one patient image → 13 MES levels
(linspace 0→3) with shared initial noise, 50 DDIM steps, 256² output
(inference_pipeline_ip.py:89-94,604-609). Here the whole progression is a
single fused jitted program (DDIM scan + VAE decode, batch 13).

Prints one JSON line {"metric": "p50_latency_13step_mes_progression_s", ...}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50
IMAGE_SIZE = 256
LEVELS = 13


def main() -> None:
    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    enable_compile_cache()
    cfg = Config()
    core_cfg = core_config_from(cfg, remat=False, dtype=jnp.bfloat16)
    model = DADD(cfg, core_cfg=core_cfg, vae_cfg=VAEConfig(dtype=jnp.bfloat16))

    rng = jax.random.PRNGKey(0)
    lat = IMAGE_SIZE // 8

    def _bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    params = _bf16(fast_init(
        model.core, {"params": rng, "noise": rng},
        jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, model.clip_cfg.num_positions, core_cfg.clip_hidden_dim)),
        0.0,
    ))
    vae_params = _bf16(fast_init(
        model.vae, jax.random.PRNGKey(1),
        jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16),
        jax.random.PRNGKey(2),
    ))

    n_tok = 3 * core_cfg.num_aoe_tokens
    cond = jax.random.normal(rng, (LEVELS, n_tok, 768), jnp.float32)

    def progression(key):
        return model.generate(
            params, vae_params, cond, key,
            image_size=IMAGE_SIZE, sampling_steps=STEPS,
            steer_scale=1.0, shared_noise=True,
        )

    checksum = jax.jit(lambda imgs: imgs.astype(jnp.float32).sum())
    imgs = np.asarray(progression(jax.random.PRNGKey(10)))
    assert imgs.shape == (LEVELS, IMAGE_SIZE, IMAGE_SIZE, 3)
    assert np.isfinite(imgs).all()

    times = []
    for i in range(9):
        t0 = time.perf_counter()
        s = np.asarray(checksum(progression(jax.random.PRNGKey(20 + i))))
        assert np.isfinite(s)
        times.append(time.perf_counter() - t0)

    p50 = float(np.percentile(times, 50))
    result = {
        "metric": "p50_latency_13step_mes_progression_s",
        "value": round(p50, 4),
        "unit": "s",
        "image_size": IMAGE_SIZE,
        "sampling_steps": STEPS,
    }
    print(json.dumps(result))
    if len(sys.argv) > 1 and sys.argv[1] == "--out":
        Path(sys.argv[2]).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
