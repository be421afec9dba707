"""In-process generation server with micro-batching.

Production-serving counterpart absent from the reference (its inference is
one-shot CLIs). Requests (structure features + target/source labels) are
queued, grouped into fixed-size batches (static shapes → one compiled
program reused forever), padded when partial, run through the DDIM scan +
VAE decode, and fulfilled as futures. Throughput scales with the dp mesh
via DADD.sample(mesh=...).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class GenRequest:
    clip_feats: np.ndarray  # (S, D) or (D,) — single-sample CLIP features
    target_label: float
    source_label: float
    seed: int = 0
    future: Future = field(default_factory=Future)


class GenerationServer:
    def __init__(
        self,
        model,
        core_params,
        vae_params,
        image_size: int = 256,
        sampling_steps: int = 50,
        steer_scale: float = 1.0,
        max_batch: int = 8,
        max_wait_s: float = 0.05,
        mesh=None,
        encoder_stride: int = 1,
        cache_mode: str = "encoder",
        sampler: str = "ddim",
    ):
        self.model = model
        self.core = core_params
        self.vae = vae_params
        self.image_size = image_size
        self.steps = sampling_steps
        self.steer = steer_scale
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.mesh = mesh
        # turbo serving (opt-in, quality-gated — docs/parity.md): feature
        # propagation across non-key steps; ToMe comes in via `model`'s
        # UNetConfig.tome_* (build_model(tome_ratio=..., tome_mode=...))
        self.encoder_stride = encoder_stride
        self.cache_mode = cache_mode
        # "dpm" = DPM-Solver++(2M); pair with sampling_steps 20-25
        self.sampler = sampler
        self._q: "queue.Queue[Optional[GenRequest]]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---- client API -----------------------------------------------------
    def submit(self, clip_feats, target_label, source_label, seed=0) -> Future:
        req = GenRequest(np.asarray(clip_feats, np.float32),
                         float(target_label), float(source_label), int(seed))
        self._q.put(req)
        return req.future

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=60)

    # ---- worker ----------------------------------------------------------
    def _collect_batch(self):
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = self.max_wait_s
        while len(batch) < self.max_batch:
            try:
                req = self._q.get(timeout=deadline)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # keep the sentinel for shutdown
                break
            batch.append(req)
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                if self._stop.is_set():
                    return
                continue
            try:
                images = self._generate(batch)
                for req, img in zip(batch, images):
                    req.future.set_result(img)
            except Exception as e:  # pragma: no cover - propagate to clients
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _generate(self, batch):
        n = len(batch)
        B = self.max_batch  # fixed shape: pad partial batches
        feats = np.stack([r.clip_feats for r in batch])
        if n < B:
            feats = np.concatenate([feats, np.repeat(feats[-1:], B - n, 0)])
        targets = np.asarray(
            [r.target_label for r in batch] + [0.0] * (B - n), np.float32
        )
        sources = np.asarray(
            [r.source_label for r in batch] + [0.0] * (B - n), np.float32
        )
        cond = self.model.prepare_inference_cond(
            self.core, jnp.asarray(targets), jnp.asarray(sources),
            jnp.asarray(feats),
        )
        # One noise key per BATCH (folded from the first request's seed):
        # co-batched requests get distinct per-sample noise (shared_noise=
        # False splits per sample) but a request's seed is only reproducible
        # when it leads its batch. Exact per-request reproducibility needs
        # max_batch=1 or a dedicated submit-with-batch API.
        key = jax.random.fold_in(jax.random.PRNGKey(17), batch[0].seed)
        lat = self.model.sample(
            self.core, cond, key,
            image_size=self.image_size, sampling_steps=self.steps,
            steer_scale=self.steer, shared_noise=False, mesh=self.mesh,
            encoder_stride=self.encoder_stride, cache_mode=self.cache_mode,
            sampler=self.sampler,
        )
        imgs = np.asarray(self.model.decode_latents(self.vae, lat))
        return imgs[:n]
