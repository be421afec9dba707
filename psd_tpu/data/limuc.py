"""LIMUC data pipeline: directory-per-class loading, PIL augments, dual
SD/CLIP outputs, inverse-frequency class-balanced sampling, threaded
host-side prefetch feeding the device.

Capability match to src/data/datamodule_ip.py:
  * directory-per-class scan with sorted class names (:55-76)
  * per-item: PIL augment (center-crop → hflip p.5 → rotation ±deg →
    perspective p.3) → resize (image_size)² → SD normalize [0.5]³ →
    ALSO CLIP-preprocess the same tensor (:81-99). CLIP preprocessing
    uses transformers' CLIPImageProcessor for byte parity.
  * WeightedRandomSampler with weights 1/(count+1e-8) (:170-186)
  * prefetch (threads replace worker processes; arrays are NHWC)

Outputs are NHWC float32: image (S,S,3) in [-1,1], label float,
clip_image (224,224,3) CLIP-normalized.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tiff")


def _get_clip_processor(path_or_none: Optional[str] = None, size: int = 224):
    from transformers import CLIPImageProcessor

    if path_or_none and Path(path_or_none).exists():
        return CLIPImageProcessor.from_pretrained(path_or_none)
    # openai/clip-vit-large-patch14 defaults: bicubic shortest-edge resize,
    # center crop, CLIP mean/std
    return CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": size},
        do_center_crop=True,
        crop_size={"height": size, "width": size},
        do_rescale=True,
        do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )


@dataclass
class AugmentConfig:
    center_crop: Optional[int] = 224
    flip: bool = True
    rotation: float = 5.0
    perspective: float = 0.2
    perspective_p: float = 0.3


class PILAugment:
    """Train-time PIL-level augmentations (datamodule_ip.py:135-158)."""

    def __init__(self, cfg: AugmentConfig, rng: np.random.Generator):
        self.cfg = cfg
        self.rng = rng

    def __call__(self, img: Image.Image) -> Image.Image:
        c = self.cfg
        if c.center_crop:
            w, h = img.size
            s = c.center_crop
            left, top = max((w - s) // 2, 0), max((h - s) // 2, 0)
            img = img.crop((left, top, left + min(s, w), top + min(s, h)))
        if c.flip and self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if c.rotation > 0:
            deg = float(self.rng.uniform(-c.rotation, c.rotation))
            img = img.rotate(deg, resample=Image.NEAREST, expand=False)
        if c.perspective > 0 and self.rng.random() < c.perspective_p:
            img = self._perspective(img, c.perspective)
        return img

    def _perspective(self, img: Image.Image, scale: float) -> Image.Image:
        """torchvision RandomPerspective-style random corner displacement."""
        w, h = img.size
        dx, dy = scale * w / 2, scale * h / 2
        r = self.rng
        tl = (r.uniform(0, dx), r.uniform(0, dy))
        tr = (w - r.uniform(0, dx), r.uniform(0, dy))
        br = (w - r.uniform(0, dx), h - r.uniform(0, dy))
        bl = (r.uniform(0, dx), h - r.uniform(0, dy))
        src = [tl, tr, br, bl]
        dst = [(0, 0), (w, 0), (w, h), (0, h)]
        coeffs = _perspective_coeffs(dst, src)
        return img.transform((w, h), Image.PERSPECTIVE, coeffs, Image.BILINEAR)


def _perspective_coeffs(src, dst):
    a = []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
    A = np.asarray(a, dtype=np.float64)
    b = np.asarray(dst, dtype=np.float64).reshape(8)
    return np.linalg.solve(A, b).tolist()


class LIMUCDataset:
    """Directory-per-class image dataset with dual SD/CLIP outputs."""

    def __init__(
        self,
        root: str | Path,
        image_size: int = 256,
        augment: Optional[AugmentConfig] = None,
        return_clip: bool = True,
        clip_processor=None,
        clip_size: int = 224,
        seed: int = 0,
    ):
        self.root = Path(root)
        self.image_size = image_size
        self.return_clip = return_clip
        self.rng = np.random.default_rng(seed)
        self.augment = PILAugment(augment, self.rng) if augment else None
        self._clip = clip_processor or (_get_clip_processor(size=clip_size) if return_clip else None)

        classes = sorted(
            d.name for d in self.root.iterdir() if d.is_dir()
        )
        if not classes:
            raise FileNotFoundError(f"No class directories under {self.root}")
        self.class_to_idx: Dict[str, int] = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[Path, int]] = []
        for c in classes:
            for f in sorted((self.root / c).iterdir()):
                if f.suffix.lower() in _IMG_EXTS:
                    self.samples.append((f, self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def class_counts(self) -> np.ndarray:
        counts = np.zeros(len(self.class_to_idx), np.int64)
        for _, lbl in self.samples:
            counts[lbl] += 1
        return counts

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        from . import native

        path, label = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.augment is not None:
            img = self.augment(img)
        if native.HAVE_NATIVE:
            # native resize (PIL-BILINEAR parity, tests/test_native.py) +
            # fused u8→f32 SD normalize — one pass instead of three
            u8 = native.resize_bilinear(
                np.asarray(img, np.uint8), self.image_size, self.image_size
            )
            arr = u8.astype(np.float32) / 255.0  # [0,1] for CLIP preprocessing
            sd_image = native.normalize(u8, mean=[0.5] * 3, std=[0.5] * 3)
        else:
            resized = img.resize((self.image_size, self.image_size), Image.BILINEAR)
            arr = np.asarray(resized, np.float32) / 255.0  # (S,S,3) in [0,1]
            sd_image = arr * 2.0 - 1.0

        out = {"image": sd_image, "label": np.float32(label)}
        if self.return_clip:
            clip = self._clip(
                images=arr, return_tensors="np", do_rescale=False
            ).pixel_values[0]  # (3,224,224)
            out["clip_image"] = np.transpose(clip, (1, 2, 0)).astype(np.float32)
        return out

    def balanced_weights(self) -> np.ndarray:
        """Per-sample inverse-frequency weights (datamodule_ip.py:170-186)."""
        counts = self.class_counts.astype(np.float64)
        w = 1.0 / (counts + 1e-8)
        labels = np.asarray([lbl for _, lbl in self.samples])
        sw = w[labels]
        return sw / sw.sum()


class DataLoader:
    """Threaded batching loader with inverse-frequency sampling + prefetch."""

    def __init__(
        self,
        dataset: LIMUCDataset,
        batch_size: int,
        shuffle: bool = True,
        class_balanced: bool = True,
        num_threads: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.class_balanced = class_balanced
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.ds)
        if self.class_balanced:
            return self.rng.choice(n, size=n, replace=True, p=self.ds.balanced_weights())
        idx = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        batch_idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
                        items = list(pool.map(self.ds.load, batch_idx))
                        batch = {
                            k: np.stack([it[k] for it in items]) for k in items[0]
                        }
                        q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
