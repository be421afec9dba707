"""In-process generation server with micro-batching and dispatch pipelining.

Production-serving counterpart absent from the reference (its inference is
one-shot CLIs; the closest thing is the batched loop in
evaluation_pipeline.py:867-975). Requests (structure features +
target/source labels) are queued, grouped into fixed-size batches (static
shapes → one compiled program reused forever), padded when partial, run
through the fused DDIM/DPM scan + VAE decode, and fulfilled as futures.

Pipelining (`pipeline_depth`, default 2): the worker dispatches batch N+1
BEFORE reading batch N's images back to the host, so the device never
idles during the device→host transfer + future fulfillment. On a single
TPU core two programs cannot overlap in device time — the win is exactly
the readback/host-bookkeeping window, which the serialized design spends
with an idle chip (measured in bench_out/bench_serve.json; through the
axon dev relay the window is seconds, on production hosts milliseconds —
either way the pipelined worker removes it). `pipeline_depth=1` restores
strictly-serialized behavior.

Throughput scales with the dp mesh via DADD.sample(mesh=...).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
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
        pipeline_depth: int = 2,
        fused: bool = True,
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
        # batches in flight before the worker blocks on readback (see
        # module docstring); 1 = fully serialized
        self.pipeline_depth = max(int(pipeline_depth), 1)
        # fused=True → ONE dispatch per batch (DADD.generate: scan + VAE
        # decode in one jitted program). fused=False splits sample/decode
        # into two dispatches — required under a mesh (DADD.sample takes
        # the mesh), and what bench_serve.py A/Bs to price the dispatch tax.
        self.fused = fused and mesh is None
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
        self._worker.join(timeout=120)

    # ---- worker ----------------------------------------------------------
    def _collect_batch(self, block: bool = True):
        try:
            first = self._q.get() if block else self._q.get(
                timeout=self.max_wait_s)
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        while len(batch) < self.max_batch:
            try:
                req = self._q.get(timeout=self.max_wait_s)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # keep the sentinel for shutdown
                break
            batch.append(req)
        return batch

    def _run(self):
        # (requests, device_images) batches dispatched but not yet read back
        inflight: deque = deque()
        while True:
            # with work in flight, don't block forever on the queue — an
            # empty poll flushes the oldest in-flight batch instead
            batch = self._collect_batch(block=not inflight)
            if batch:
                try:
                    inflight.append((batch, self._dispatch(batch)))
                except Exception as e:  # pragma: no cover - propagate
                    for req in batch:
                        if not req.future.done():
                            req.future.set_exception(e)
            if inflight and (len(inflight) >= self.pipeline_depth
                             or not batch):
                reqs, dev_imgs = inflight.popleft()
                try:
                    self._fulfill(reqs, dev_imgs)
                except Exception as e:  # pragma: no cover - propagate
                    for req in reqs:
                        if not req.future.done():
                            req.future.set_exception(e)
            if self._stop.is_set() and not inflight and self._q.empty():
                return

    def _dispatch(self, batch):
        """Build the padded batch and dispatch generation — ASYNC: returns
        device arrays without forcing a host readback."""
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
        if self.fused:
            return self.model.generate(
                self.core, self.vae, cond, key,
                image_size=self.image_size, sampling_steps=self.steps,
                steer_scale=self.steer, shared_noise=False,
                encoder_stride=self.encoder_stride,
                cache_mode=self.cache_mode, sampler=self.sampler,
            )
        lat = self.model.sample(
            self.core, cond, key,
            image_size=self.image_size, sampling_steps=self.steps,
            steer_scale=self.steer, shared_noise=False, mesh=self.mesh,
            encoder_stride=self.encoder_stride, cache_mode=self.cache_mode,
            sampler=self.sampler,
        )
        return self.model.decode_latents(self.vae, lat)

    def _fulfill(self, reqs, dev_imgs):
        """Host readback + future fulfillment (the part pipelining overlaps
        with the next batch's device work)."""
        imgs = np.asarray(dev_imgs)
        for req, img in zip(reqs, imgs[: len(reqs)]):
            req.future.set_result(img)
