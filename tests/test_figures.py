"""Paper-figure tooling tests: all three modes of scripts/create_paper_figure."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from create_paper_figure import (  # noqa: E402
    create_comparison_grid,
    create_horizontal_grid,
    create_single_row_with_reference,
    find_closest_image,
    main as figure_main,
)


@pytest.fixture()
def run_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "run"
    d.mkdir()
    for mes in (0.0, 0.75, 1.5, 2.25, 3.0):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(d / f"mes_{mes:.2f}.png")
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(d / "structure_reference.png")
    return d


def test_find_closest_image(run_dir):
    path, actual = find_closest_image(run_dir, 1.0)
    assert actual == 0.75 and path.name == "mes_0.75.png"
    path, actual = find_closest_image(run_dir, 2.9)
    assert actual == 3.0


def test_reference_mode_layout(run_dir, tmp_path):
    """Reference image + arrow + 4 MES panels in one row."""
    out = create_single_row_with_reference(
        run_dir, tmp_path / "fig.png", mes_values=(0.0, 1.0, 2.0, 3.0),
        image_size=64, font_size=12,
    )
    img = Image.open(out)
    pad, arrow = 15, 40
    assert img.width == 5 * 64 + 6 * pad + arrow  # ref + 4 panels + arrow
    assert img.height == 64 + 45 + 2 * pad


def test_reference_mode_without_reference(run_dir, tmp_path):
    out = create_single_row_with_reference(
        run_dir, tmp_path / "fig.png", mes_values=(0.0, 3.0),
        image_size=64, include_reference=False,
    )
    img = Image.open(out)
    assert img.width == 2 * 64 + 3 * 15  # no ref, no arrow


def test_horizontal_and_comparison(run_dir, tmp_path):
    out = create_horizontal_grid(run_dir, tmp_path / "h.png", image_size=64,
                                 title="ours")
    assert Image.open(out).width > 5 * 64
    out2 = create_comparison_grid([run_dir, run_dir], ["a", "b"],
                                  tmp_path / "c.png", image_size=64)
    img = Image.open(out2)
    assert img.height > 2 * 64  # two rows


def test_cli_mode_defaults(run_dir, tmp_path):
    out = figure_main(["-i", str(run_dir), "-o", str(tmp_path / "cli.png"),
                       "--image-size", "64"])
    assert Path(out).exists()  # defaults to reference mode for one dir
