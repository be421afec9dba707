"""GenerationServer throughput: serialized vs pipelined, fused vs split.

Measures the serving loop the reference runs as a batched Python for-loop
(`evaluation_pipeline.py:867-975`) as an actual server: requests submitted
as futures, micro-batched, generated on device, images read back to the
host. Three A/Bs at the turbo operating point (bench.py TURBO):

  serialized   pipeline_depth=1 — dispatch, read back, dispatch ...
  pipelined    pipeline_depth=2 — batch N+1 dispatched BEFORE batch N's
               device->host readback (the chip never idles on the transfer)
  split        fused=False at depth=2 — sample + decode as TWO dispatches
               (the mesh path) to price the extra dispatch

Emits ONE JSON line (bench_out/bench_serve.json via run_bench_suite.sh).
NOTE on the dev relay: device->host moves ~10 MB/s here vs GB/s on a
production host, so the absolute pipelined-vs-serialized gap is inflated;
the DELTA structure (pipelining hides the readback window entirely once
depth>=2) is what transfers. uint8 readback (4x smaller) is reported too.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8, help="server max_batch")
    ap.add_argument("--batches", type=int, default=4,
                    help="number of full batches' worth of requests")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from bench import TURBO

    from psd_tpu.core.config import Config
    from psd_tpu.diffusion.dadd import DADD, core_config_from
    from psd_tpu.models.vae import VAEConfig
    from psd_tpu.pipelines.serve import GenerationServer
    from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

    enable_compile_cache()
    cfg = Config()
    core_cfg = core_config_from(
        cfg, remat=False, dtype=jnp.bfloat16,
        tome_ratio=TURBO["tome_ratio"], tome_mode=TURBO["tome_mode"])
    model = DADD(cfg, core_cfg=core_cfg,
                 vae_cfg=VAEConfig(dtype=jnp.bfloat16,
                                   quant=TURBO["vae_quant"]))

    def _bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    rng = jax.random.PRNGKey(0)
    lat = args.size // 8
    params = _bf16(fast_init(
        model.core, {"params": rng, "noise": rng},
        jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, model.clip_cfg.num_positions,
                   core_cfg.clip_hidden_dim)), 0.0))
    vae_params = _bf16(fast_init(
        model.vae, jax.random.PRNGKey(1),
        jnp.zeros((1, args.size, args.size, 3), jnp.bfloat16),
        jax.random.PRNGKey(2)))

    host = np.random.default_rng(0)
    n_req = args.batches * args.batch
    feats = host.normal(size=(
        n_req, model.clip_cfg.num_positions, core_cfg.clip_hidden_dim,
    )).astype(np.float32)

    def run(depth: int, fused: bool) -> float:
        server = GenerationServer(
            model, params, vae_params, image_size=args.size,
            sampling_steps=TURBO["steps"], max_batch=args.batch,
            max_wait_s=0.02, encoder_stride=TURBO["encoder_stride"],
            cache_mode=TURBO["cache_mode"], sampler=TURBO["sampler"],
            pipeline_depth=depth, fused=fused)
        # warmup: compile the program once outside the timed window
        f = server.submit(feats[0], 1.0, 0.0, seed=0)
        img = f.result(timeout=3000)
        assert img.shape == (args.size, args.size, 3)
        assert np.isfinite(img).all()
        t0 = time.perf_counter()
        futures = [
            server.submit(feats[i], float(i % 4), 0.0, seed=i)
            for i in range(n_req)
        ]
        for f in futures:
            f.result(timeout=3000)
        dt = time.perf_counter() - t0
        server.close()
        return n_req / dt

    report = {
        "metric": "serve_img_per_s_e2e_turbo",
        "size": args.size, "max_batch": args.batch,
        "n_requests": n_req, "turbo": TURBO,
        "serialized_img_per_s": round(run(1, True), 4),
        "pipelined_img_per_s": round(run(2, True), 4),
        "split_dispatch_img_per_s": round(run(2, False), 4),
        "note": "e2e incl. device->host image readback; on this dev relay "
                "readback is ~10 MB/s (production hosts: GB/s), so the "
                "pipelined gain is an upper bound on the readback window",
    }
    report["value"] = report["pipelined_img_per_s"]
    line = json.dumps(report)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
