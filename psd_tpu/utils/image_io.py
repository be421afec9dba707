"""Image saving helpers (PNG sequences, progression grids, async writes).

Replaces the reference's torchvision save_image + PIL grid assembly
(inference_pipeline_ip.py:489-563) and the augment factory's
ThreadPoolExecutor async BMP writes (inference_pipeline_ip_data_augment
.py:434-498).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def to_uint8(img: np.ndarray) -> np.ndarray:
    """(H,W,3) float in [0,1] → uint8 (native fused clip+scale+round when
    the C++ host kernels are built, psd_tpu.data.native)."""
    from ..data import native

    if native.HAVE_NATIVE and img.dtype == np.float32:
        return native.to_uint8(img)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(img: np.ndarray, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    u8 = to_uint8(img)
    if path.suffix.lower() == ".bmp":
        # native BMP writer (reference async-writes BMPs in the augment
        # factory, inference_pipeline_ip_data_augment.py:434-498)
        from ..data import native

        native.write_bmp(path, u8)
        return
    Image.fromarray(u8).save(path)


def save_sequence(
    images: np.ndarray,  # (N,H,W,3) in [0,1]
    labels: Sequence[float],
    out_dir: str | Path,
    prefix: str = "mes",
) -> List[Path]:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for img, lbl in zip(images, labels):
        p = out_dir / f"{prefix}_{lbl:.2f}.png"
        save_image(img, p)
        paths.append(p)
    return paths


def progression_grid(
    images: np.ndarray,  # (N,H,W,3) in [0,1]
    labels: Sequence[float],
    path: str | Path,
    reference: Optional[np.ndarray] = None,
    pad: int = 4,
    label_band: int = 20,
) -> Path:
    """Horizontal strip with MES labels (reference `_create_progression_grid`)."""
    imgs = [to_uint8(im) for im in images]
    if reference is not None:
        imgs = [to_uint8(reference)] + imgs
        labels = ["ref"] + [f"{v:.2f}" for v in labels]
    else:
        labels = [f"{v:.2f}" for v in labels]
    h, w = imgs[0].shape[:2]
    n = len(imgs)
    grid = Image.new(
        "RGB", (n * w + (n + 1) * pad, h + 2 * pad + label_band), (255, 255, 255)
    )
    draw = ImageDraw.Draw(grid)
    for i, (im, lbl) in enumerate(zip(imgs, labels)):
        x = pad + i * (w + pad)
        grid.paste(Image.fromarray(im), (x, pad))
        draw.text((x + 2, h + pad + 2), f"MES {lbl}", fill=(0, 0, 0))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    grid.save(path)
    return path


class AsyncImageWriter:
    """Overlap device→host decode with disk writes (augment factory)."""

    def __init__(self, max_workers: int = 8):
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._futures = []

    def submit(self, img: np.ndarray, path: str | Path) -> None:
        self._futures.append(self._pool.submit(save_image, img, path))

    def flush(self) -> None:
        for f in self._futures:
            f.result()
        self._futures.clear()

    def close(self) -> None:
        self.flush()
        self._pool.shutdown()
