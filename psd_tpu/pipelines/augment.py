"""Balanced synthetic dataset factory — TPU counterpart of
src/pipelines/inference/inference_pipeline_ip_data_augment.py.

For every train image of class X, generate the (num_classes−1) other
classes (:313-341 resumable job scan — already-written outputs are
skipped), batched `--batch-images × (K−1)` per UNet invocation (:374-379),
async image writes overlapping device work (:434-498), and copy the
original train images plus val/test splits into the output dataset
(:402-418). Output file naming keeps the reference's `generated_` prefix
convention so the downstream classifier's synthetic-only filter
(classification/dataset.py:80-86) picks them up.
"""

from __future__ import annotations

import argparse
import shutil
import time
from pathlib import Path
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import load_config
from ..data.limuc import LIMUCDataset
from ..utils.image_io import AsyncImageWriter
from .common import build_model
from .infer import load_params


def build_argparser():
    p = argparse.ArgumentParser(description="DADD synthetic dataset factory (TPU)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--batch-images", type=int, default=4)
    p.add_argument("--sampling-steps", type=int, default=None)
    p.add_argument("--steer-scale", type=float, default=1.0)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--copy-splits", action="store_true",
                   help="copy originals + val/test into output dataset")
    p.add_argument("--format", type=str, default="bmp", choices=["bmp", "png"],
                   help="bmp matches the reference's async BMP writes "
                        "(26x faster via the native writer); png compresses")
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    from .common import add_turbo_args

    add_turbo_args(p)
    return p


def collect_pending_jobs(
    ds: LIMUCDataset, out_dir: Path, num_classes: int,
    max_images: int | None = None, ext: str = "bmp",
) -> List[Tuple[int, float, float, Path]]:
    """Resumable job scan: skip outputs that already exist (:313-341)."""
    jobs = []
    n = len(ds.samples) if max_images is None else min(max_images, len(ds.samples))
    idx_to_class = {v: k for k, v in ds.class_to_idx.items()}
    for idx in range(n):
        path, src = ds.samples[idx]
        for tgt in range(num_classes):
            if tgt == src:
                continue
            cls_name = idx_to_class[tgt]
            # the source CLASS is part of the name: the reference's
            # `{stem}_generated.bmp` (:329) silently overwrites when two
            # source classes contain identically-named files — on LIMUC the
            # stems are globally unique so it never fires there, but the
            # chained product-loop rehearsal (tests/test_product_loop.py)
            # showed a 3× silent dataset shrink under colliding stems.
            stem = f"generated_{path.stem}_src{src}_to_{tgt}"
            existing = [
                out_dir / "train" / cls_name / f"{stem}.{e}"
                for e in ("bmp", "png")
            ]
            if any(p.exists() for p in existing):
                continue
            jobs.append((idx, float(src), float(tgt),
                         out_dir / "train" / cls_name / f"{stem}.{ext}"))
    return jobs


def copy_splits(data_dir: Path, out_dir: Path):
    """Copy original train images + val/test splits verbatim (:402-418)."""
    for split in ("train", "val", "test"):
        src = data_dir / split
        if not src.exists():
            continue
        for cls_dir in src.iterdir():
            if not cls_dir.is_dir():
                continue
            dst = out_dir / split / cls_dir.name
            dst.mkdir(parents=True, exist_ok=True)
            for f in cls_dir.iterdir():
                if f.is_file() and not (dst / f.name).exists():
                    shutil.copy2(f, dst / f.name)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config)
    image_size = args.image_size or cfg.dataset.image_size
    steps = args.sampling_steps or cfg.diffusion.sampling_steps
    num_classes = cfg.dataset.num_classes
    out_dir = Path(args.output_dir)
    data_dir = Path(args.data_dir)

    if args.encoder_stride > 1 and args.guidance_scale != 1.0:
        raise SystemExit("--encoder-stride > 1 is incompatible with "
                         "dual-pass CFG (--guidance-scale != 1)")
    model = build_model(cfg, args.dtype, tome_ratio=args.tome_ratio,
                        tome_mode=args.tome_mode, vae_quant=args.vae_quant)
    core, vae_params, clip_params = load_params(
        model, args.checkpoint, args.seed, image_size, args.ema
    )
    ds = LIMUCDataset(
        data_dir / "train", image_size=image_size, return_clip=True,
        clip_size=model.clip_cfg.image_size, seed=args.seed,
    )

    if args.copy_splits:
        copy_splits(data_dir, out_dir)

    jobs = collect_pending_jobs(ds, out_dir, num_classes, args.max_images,
                                ext=args.format)
    print(f"{len(jobs)} pending generation jobs")
    if not jobs:
        return {"generated": 0}

    use_rg = model.core_cfg.use_routing_gates
    writer = AsyncImageWriter()
    key = jax.random.PRNGKey(args.seed)
    batch = args.batch_images * (num_classes - 1)
    t0 = time.perf_counter()
    done = 0
    from .common import pad_batch

    for b in range(0, len(jobs), batch):
        chunk = jobs[b : b + batch]
        srcs = np.asarray([j[1] for j in chunk], np.float32)
        tgts = np.asarray([j[2] for j in chunk], np.float32)
        clip_imgs = np.stack([ds.load(j[0])["clip_image"] for j in chunk])
        # pad the ragged final chunk: one sampler compile per static shape
        (srcs, tgts, clip_imgs), n_real = pad_batch([srcs, tgts, clip_imgs], batch)
        srcs, tgts = jnp.asarray(srcs), jnp.asarray(tgts)
        clip_feats = model.encode_image_clip(clip_params, jnp.asarray(clip_imgs))
        cond = model.prepare_inference_cond(core, tgts, srcs, clip_feats)
        uncond = None
        guidance = 1.0
        if not use_rg and args.guidance_scale != 1.0:
            guidance = args.guidance_scale
            uncond = model.prepare_inference_cond(
                core, tgts, srcs, clip_feats, zero_aoe=True
            )
        key = jax.random.fold_in(key, b)
        imgs = np.asarray(model.generate(
            core, vae_params, cond, key,
            image_size=image_size, sampling_steps=steps,
            steer_scale=args.steer_scale if use_rg else 0.0,
            guidance_scale=guidance, cond_uncond=uncond, shared_noise=False,
            encoder_stride=args.encoder_stride, cache_mode=args.cache_mode,
            sampler=args.sampler,
        ))[:n_real]
        for img, (_, _, _, out_path) in zip(imgs, chunk):
            writer.submit(img, out_path)
        done += len(imgs)
        if b // batch % 10 == 0:
            dt = time.perf_counter() - t0
            print(f"  {done}/{len(jobs)} ({done / max(dt, 1e-9):.2f} img/s)")
    writer.close()
    dt = time.perf_counter() - t0
    print(f"Generated {done} images in {dt:.1f}s ({done / dt:.2f} img/s) → {out_dir}")
    return {"generated": done, "seconds": dt}


if __name__ == "__main__":
    main()
