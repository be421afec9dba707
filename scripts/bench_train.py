"""SD-scale training-step benchmark on the available chip.

Measures the full DADD train step (fwd+bwd through the 859M-param UNet +
conditioning stack, AdamW update, EMA) at 256² latents — the reference's
training workload (configs/train_ip.yaml: bs 64 on one A100-class GPU).
Single-chip memory budget notes: fp32 params 3.4 GB + AdamW state 6.9 GB
+ bf16 EMA 1.7 GB + remat'd activations. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psd_tpu.core.config import Config  # noqa: E402
from psd_tpu.diffusion.dadd import DADD, core_config_from  # noqa: E402
from psd_tpu.train import build_optimizer, make_train_step  # noqa: E402
from psd_tpu.train.ema import ema_init  # noqa: E402
from psd_tpu.train.trainer import TrainState  # noqa: E402
from psd_tpu.utils.fast_init import enable_compile_cache, fast_init  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--out", type=str, default=None,
                   help="also write the result JSON to this file")
    args = p.parse_args(argv)

    enable_compile_cache()
    cfg = Config()
    core_cfg = core_config_from(cfg, remat=True, dtype=jnp.bfloat16)
    model = DADD(cfg, core_cfg=core_cfg)
    lat = args.image_size // 8
    B = args.batch

    params = fast_init(
        model.core,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(0)},
        jnp.zeros((1, lat, lat, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, 257, 1024)),
        0.0,
    )
    tx = build_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema=ema_init(params["params"], dtype=jnp.bfloat16),
    )
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, lat, lat, 4)),
        "labels": jnp.tile(jnp.arange(4.0), B // 4 if B % 4 == 0 else B)[:B],
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 257, 1024)),
    }
    rng = jax.random.PRNGKey(3)
    state, metrics = step_fn(state, batch, rng)  # compile
    loss0 = float(metrics["loss"])  # sync
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, rng)
        _ = float(metrics["loss"])  # scalar sync each step
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    result = {
        "metric": f"train_imgs_per_sec_per_chip_{args.image_size}px",
        "value": round(B / dt, 4),
        "unit": "img/s",
        "step_seconds": round(dt, 4),
        "loss0": round(loss0, 4),
    }
    print(json.dumps(result))
    if args.out:
        from pathlib import Path
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
