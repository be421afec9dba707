"""Fit a LEACE disease-erasure projection from train-set image embeddings.

Counterpart of the reference's scripts/compute_leace_projection.py: extract
projected image tokens over the train set (through CLIP + ImageProjection
+ optional purifier-free path), fit the between-class-scatter null
projection (psd_tpu.conditioning.leace.fit_leace), print the inter-class
mean-distance self-verification, and save an .npz consumed by
`psd_tpu.pipelines.infer --leace`.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psd_tpu.conditioning.leace import fit_leace, save_leace  # noqa: E402
from psd_tpu.core.config import load_config  # noqa: E402
from psd_tpu.data.limuc import LIMUCDataset  # noqa: E402
from psd_tpu.pipelines.common import build_model  # noqa: E402
from psd_tpu.pipelines.infer import load_params  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--rank", type=int, default=1)
    p.add_argument("--max-images", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="leace_projection.npz")
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    model = build_model(cfg, "fp32")
    core, _, clip_params = load_params(
        model, args.checkpoint, args.seed, cfg.dataset.image_size
    )
    ds = LIMUCDataset(
        Path(args.data_dir) / "train",
        image_size=cfg.dataset.image_size,
        return_clip=True,
        clip_size=model.clip_cfg.image_size,
        seed=args.seed,
    )

    @jax.jit
    def project(params, clip_feats):
        return model.core.apply(
            params, clip_feats,
            method=lambda m, f: m.image_projection(f),
        )

    embeds, labels = [], []
    n = min(args.max_images, len(ds))
    for b in range(0, n, args.batch_size):
        idxs = range(b, min(b + args.batch_size, n))
        items = [ds.load(i) for i in idxs]
        clip_imgs = jnp.asarray(np.stack([it["clip_image"] for it in items]))
        feats = model.encode_image_clip(clip_params, clip_imgs)
        emb = project(core, feats)
        embeds.append(np.asarray(emb))
        labels.extend(float(it["label"]) for it in items)

    embeddings = np.concatenate(embeds, axis=0)
    labels = np.asarray(labels)
    leace = fit_leace(embeddings, labels, rank=args.rank)
    s = leace["stats"]
    print(f"Class counts: {np.bincount(labels.astype(int)).tolist()}")
    print(f"Explained variance ratio: {s['explained_variance']:.4f}")
    print(f"Max inter-class mean distance BEFORE: {s['dist_before']:.4f}")
    print(f"Max inter-class mean distance AFTER:  {s['dist_after']:.4f}")
    save_leace(leace, args.output)
    print(f"Saved → {args.output}")
    return leace


if __name__ == "__main__":
    main()
