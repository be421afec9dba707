"""MES classification dataset: synthetic-only balanced train split.

Capability match to src/classification/dataset.py:
  * train split keeps ONLY files whose name contains "generated"
    (synthetic-only training, :80-86) and downsamples every class to the
    min class count with a fixed seed (:92-106)
  * val/test use the real images unfiltered
  * ImageNet normalization (:156-158); torchvision-style augments on train
    (flips/rotation/color-jitter-lite) implemented at PIL level
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image, ImageEnhance

from ..models.vgg import IMAGENET_MEAN, IMAGENET_STD
from .limuc import _IMG_EXTS


class MESClassificationDataset:
    def __init__(
        self,
        root: str | Path,
        split: str = "train",
        image_size: int = 224,
        synthetic_only_train: bool = True,
        balance_train: bool = True,
        augment: bool = True,
        seed: int = 42,
    ):
        self.root = Path(root) / split
        self.split = split
        self.image_size = image_size
        self.augment = augment and split == "train"
        self.rng = np.random.default_rng(seed)

        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        by_class: Dict[int, List[Path]] = {i: [] for i in range(len(classes))}
        for c in classes:
            for f in sorted((self.root / c).iterdir()):
                if f.suffix.lower() not in _IMG_EXTS:
                    continue
                if (
                    split == "train"
                    and synthetic_only_train
                    and "generated" not in f.name
                ):
                    continue
                by_class[self.class_to_idx[c]].append(f)

        if split == "train" and balance_train:
            counts = {c: len(v) for c, v in by_class.items() if v}
            if counts:
                m = min(counts.values())
                for c in by_class:
                    if len(by_class[c]) > m:
                        idx = self.rng.choice(len(by_class[c]), m, replace=False)
                        by_class[c] = [by_class[c][i] for i in sorted(idx)]

        self.samples: List[Tuple[Path, int]] = [
            (f, c) for c, files in by_class.items() for f in files
        ]

    def __len__(self):
        return len(self.samples)

    @property
    def class_counts(self) -> np.ndarray:
        counts = np.zeros(len(self.class_to_idx), np.int64)
        for _, c in self.samples:
            counts[c] += 1
        return counts

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        path, label = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.augment:
            if self.rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if self.rng.random() < 0.5:
                img = img.transpose(Image.FLIP_TOP_BOTTOM)
            deg = float(self.rng.uniform(-15, 15))
            img = img.rotate(deg, resample=Image.BILINEAR)
            # light color jitter
            img = ImageEnhance.Brightness(img).enhance(
                1.0 + self.rng.uniform(-0.2, 0.2)
            )
            img = ImageEnhance.Contrast(img).enhance(
                1.0 + self.rng.uniform(-0.2, 0.2)
            )
        from . import native

        if native.HAVE_NATIVE:
            u8 = native.resize_bilinear(
                np.asarray(img, np.uint8), self.image_size, self.image_size
            )
            arr = native.normalize(u8, mean=IMAGENET_MEAN, std=IMAGENET_STD)
        else:
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
            arr = np.asarray(img, np.float32) / 255.0
            arr = (arr - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
                IMAGENET_STD, np.float32
            )
        return {"image": arr, "label": np.int32(label)}

    def batches(self, batch_size: int, shuffle: bool = True, drop_last: bool = True):
        idx = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(idx)
        nb = len(self) // batch_size if drop_last else -(-len(self) // batch_size)
        for b in range(nb):
            sel = idx[b * batch_size : (b + 1) * batch_size]
            items = [self.load(i) for i in sel]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "label": np.stack([it["label"] for it in items]),
            }
