"""Paper-figure assembly: labeled horizontal / comparison grids from
`mes_*.png` progression outputs (counterpart of the reference's
scripts/create_paper_figure.py)."""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _collect(run_dir: Path):
    items = []
    for f in sorted(run_dir.glob("mes_*.png")):
        m = re.match(r"mes_([\d.]+)\.png", f.name)
        if m:
            items.append((float(m.group(1)), f))
    return sorted(items)


def create_horizontal_grid(run_dir: Path, out: Path, pad: int = 6,
                           label_band: int = 24):
    items = _collect(run_dir)
    if not items:
        raise FileNotFoundError(f"no mes_*.png under {run_dir}")
    imgs = [Image.open(f) for _, f in items]
    w, h = imgs[0].size
    grid = Image.new("RGB", (len(imgs) * (w + pad) + pad, h + 2 * pad + label_band),
                     (255, 255, 255))
    draw = ImageDraw.Draw(grid)
    for i, ((mes, _), im) in enumerate(zip(items, imgs)):
        x = pad + i * (w + pad)
        grid.paste(im, (x, pad))
        draw.text((x + 2, h + pad + 4), f"MES {mes:.2f}", fill=(0, 0, 0))
    out.parent.mkdir(parents=True, exist_ok=True)
    grid.save(out)
    return out


def create_comparison_grid(run_dirs, labels, out: Path, pad: int = 6,
                           label_band: int = 24):
    """Stack one horizontal progression row per run, row labels at left."""
    rows = []
    for d in run_dirs:
        items = _collect(Path(d))
        rows.append([Image.open(f) for _, f in items])
    w, h = rows[0][0].size
    ncol = max(len(r) for r in rows)
    left = 90
    grid = Image.new(
        "RGB",
        (left + ncol * (w + pad) + pad, len(rows) * (h + pad) + pad + label_band),
        (255, 255, 255),
    )
    draw = ImageDraw.Draw(grid)
    for r, (row, lbl) in enumerate(zip(rows, labels)):
        y = pad + r * (h + pad)
        draw.text((4, y + h // 2), str(lbl), fill=(0, 0, 0))
        for c, im in enumerate(row):
            grid.paste(im, (left + pad + c * (w + pad), y))
    out.parent.mkdir(parents=True, exist_ok=True)
    grid.save(out)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run-dirs", type=str, nargs="+", required=True)
    p.add_argument("--labels", type=str, nargs="*", default=None)
    p.add_argument("--output", type=str, default="figure.png")
    args = p.parse_args(argv)
    out = Path(args.output)
    if len(args.run_dirs) == 1:
        create_horizontal_grid(Path(args.run_dirs[0]), out)
    else:
        labels = args.labels or [Path(d).name for d in args.run_dirs]
        create_comparison_grid(args.run_dirs, labels, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
