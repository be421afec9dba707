"""Paper-figure assembly from `mes_*.png` progression outputs.

Counterpart of the reference's scripts/create_paper_figure.py (451 LoC) with
all three modes:
  horizontal  — one labeled row of the selected MES levels (+optional title)
  reference   — structure_reference.png | arrow | MES progression row, with
                closest-available-MES selection (create_single_row_with_
                reference in the reference)
  comparison  — one row per run dir, row labels at the left

Selection picks the mes_*.png closest to each requested --mes-values entry
(reference find_closest_image); images are resized LANCZOS to --image-size.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

from PIL import Image, ImageDraw, ImageFont

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _collect(run_dir: Path):
    items = []
    for f in sorted(run_dir.glob("mes_*.png")):
        m = re.match(r"mes_([\d.]+)\.png", f.name)
        if m:
            items.append((float(m.group(1)), f))
    return sorted(items)


def find_closest_image(folder: Path, target_mes: float):
    """(path, actual_mes) of the mes_*.png nearest to target, or (None, nan)."""
    items = _collect(Path(folder))
    if not items:
        return None, float("nan")
    mes, path = min(items, key=lambda t: abs(t[0] - target_mes))
    return path, mes


def get_font(size: int):
    for name in ("DejaVuSans.ttf", "Arial.ttf", "LiberationSans-Regular.ttf"):
        try:
            return ImageFont.truetype(name, size)
        except OSError:
            continue
    return ImageFont.load_default()


def _open_at(path: Path, size: int) -> Image.Image:
    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.LANCZOS)
    return img


def _centered_label(draw, text, x, y, width, font):
    bbox = draw.textbbox((0, 0), text, font=font)
    draw.text((x + (width - (bbox[2] - bbox[0])) // 2, y), text,
              fill=(0, 0, 0), font=font)


def _select(folder: Path, mes_values):
    out = []
    for target in mes_values:
        path, actual = find_closest_image(folder, target)
        if path is not None:
            out.append((path, target, actual))
    return out


def create_horizontal_grid(run_dir, out, mes_values=None, image_size=256,
                           font_size=20, title=None, pad=6, label_band=28):
    run_dir = Path(run_dir)
    if mes_values:
        picked = [(p, t) for p, t, _ in _select(run_dir, mes_values)]
    else:
        picked = [(f, mes) for mes, f in _collect(run_dir)]
    if not picked:
        raise FileNotFoundError(f"no mes_*.png under {run_dir}")
    imgs = [_open_at(f, image_size) for f, _ in picked]
    w = h = image_size
    title_band = font_size + 10 if title else 0
    grid = Image.new(
        "RGB",
        (len(imgs) * (w + pad) + pad, h + 2 * pad + label_band + title_band),
        (255, 255, 255),
    )
    draw = ImageDraw.Draw(grid)
    font = get_font(font_size)
    if title:
        _centered_label(draw, title, 0, 4, grid.width, font)
    for i, ((_, mes), im) in enumerate(zip(picked, imgs)):
        x = pad + i * (w + pad)
        grid.paste(im, (x, pad + title_band))
        _centered_label(draw, f"MES {mes:.1f}", x, title_band + h + pad + 4,
                        w, font)
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    grid.save(out, dpi=(300, 300))
    return out


def create_single_row_with_reference(
    run_dir, out, mes_values=(0.0, 1.0, 2.0, 3.0), image_size=256,
    font_size=26, include_reference=True, add_arrow=True,
    reference_label="Reference", pad=15, label_band=45,
):
    """Structure reference | → | closest-MES progression row."""
    run_dir = Path(run_dir)
    ref_path = run_dir / "structure_reference.png"
    has_ref = include_reference and ref_path.exists()
    picked = _select(run_dir, mes_values)
    if not picked and not has_ref:
        raise FileNotFoundError(f"nothing to draw under {run_dir}")

    n = len(picked) + (1 if has_ref else 0)
    arrow_w = 40 if (add_arrow and has_ref) else 0
    W = n * image_size + (n + 1) * pad + arrow_w
    H = image_size + label_band + 2 * pad
    canvas = Image.new("RGB", (W, H), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    font = get_font(font_size)

    x = pad
    if has_ref:
        canvas.paste(_open_at(ref_path, image_size), (x, pad))
        _centered_label(draw, reference_label, x, pad + image_size + 5,
                        image_size, font)
        x += image_size + pad
        if add_arrow:
            ay = pad + image_size // 2
            ax0, ax1 = x, x + arrow_w - 10
            draw.line([(ax0, ay), (ax1, ay)], fill=(100, 100, 100), width=3)
            draw.polygon(
                [(ax1, ay), (ax1 - 10, ay - 8), (ax1 - 10, ay + 8)],
                fill=(100, 100, 100),
            )
            x += arrow_w

    for path, target, _actual in picked:
        canvas.paste(_open_at(path, image_size), (x, pad))
        _centered_label(draw, f"MES {target:.1f}", x, pad + image_size + 5,
                        image_size, font)
        x += image_size + pad

    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    canvas.save(out, dpi=(300, 300))
    return out


def create_comparison_grid(run_dirs, labels, out, mes_values=None,
                           image_size=256, font_size=18, pad=6,
                           label_band=28, left=110):
    """Stack one horizontal progression row per run, row labels at left."""
    rows = []
    for d in run_dirs:
        if mes_values:
            rows.append([_open_at(p, image_size)
                         for p, _, _ in _select(Path(d), mes_values)])
        else:
            rows.append([_open_at(f, image_size)
                         for _, f in _collect(Path(d))])
    w = h = image_size
    ncol = max(len(r) for r in rows)
    grid = Image.new(
        "RGB",
        (left + ncol * (w + pad) + pad, len(rows) * (h + pad) + pad + label_band),
        (255, 255, 255),
    )
    draw = ImageDraw.Draw(grid)
    font = get_font(font_size)
    for r, (row, lbl) in enumerate(zip(rows, labels)):
        y = pad + r * (h + pad)
        draw.text((4, y + h // 2), str(lbl), fill=(0, 0, 0), font=font)
        for c, im in enumerate(row):
            grid.paste(im, (left + pad + c * (w + pad), y))
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    grid.save(out, dpi=(300, 300))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Create paper figures from MES progression outputs"
    )
    p.add_argument("--input", "-i", "--run-dirs", dest="run_dirs", type=str,
                   nargs="+", required=True,
                   help="run dir(s) containing mes_*.png")
    p.add_argument("--output", "-o", type=str, default=None)
    p.add_argument("--mode", "-m",
                   choices=["horizontal", "reference", "comparison"],
                   default=None, help="default: reference for one dir, "
                   "comparison for several")
    p.add_argument("--mes-values", type=float, nargs="+", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--font-size", type=int, default=26)
    p.add_argument("--title", type=str, default=None)
    p.add_argument("--labels", type=str, nargs="*", default=None)
    p.add_argument("--no-reference", action="store_true")
    p.add_argument("--no-arrow", action="store_true")
    args = p.parse_args(argv)

    mode = args.mode or ("comparison" if len(args.run_dirs) > 1 else "reference")
    out = Path(args.output or f"paper_figure_{Path(args.run_dirs[0]).name}.png")

    if mode == "horizontal":
        create_horizontal_grid(args.run_dirs[0], out, args.mes_values,
                               args.image_size, args.font_size, args.title)
    elif mode == "reference":
        create_single_row_with_reference(
            args.run_dirs[0], out,
            args.mes_values or (0.0, 1.0, 2.0, 3.0),
            args.image_size, args.font_size,
            include_reference=not args.no_reference,
            add_arrow=not args.no_arrow,
        )
    else:
        labels = args.labels or [Path(d).name for d in args.run_dirs]
        create_comparison_grid(args.run_dirs, labels, out, args.mes_values,
                               args.image_size)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
