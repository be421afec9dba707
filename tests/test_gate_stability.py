"""Unit tests for scripts/check_gate_stability.py (VERDICT r4 #4).

Pure-python: synthetic gate artifacts, no device work."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "check_gate_stability",
    Path(__file__).resolve().parent.parent
    / "scripts" / "check_gate_stability.py")
gs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gs)


def test_spearman_basics():
    assert gs.spearman([1, 2, 3], [10, 20, 30]) == pytest.approx(1.0)
    assert gs.spearman([1, 2, 3], [30, 20, 10]) == pytest.approx(-1.0)
    # ties get average ranks, correlation stays defined
    assert -1.0 <= gs.spearman([1, 1, 2], [3, 3, 4]) <= 1.0


def _write(path, rows, floor=None):
    path.write_text(json.dumps({
        "rows": rows, "weights": "test",
        "noise_floor_fresh_seeds": floor or {"fid": 0.3, "cmmd": 0.0},
    }))
    return str(path)


def test_quality_cliff_detected(tmp_path):
    a = _write(tmp_path / "a.json", [
        {"variant": "deep5", "psnr_vs_exact_db": 34.0},
        {"variant": "tomeb", "psnr_vs_exact_db": 35.0},
    ])
    b = _write(tmp_path / "b.json", [
        {"variant": "deep5", "psnr_vs_exact_db": 33.0},
        {"variant": "tomeb", "psnr_vs_exact_db": 16.0},  # the r4 collapse
    ])
    c = gs.compare_quality(gs.load_rows(a), gs.load_rows(b), cliff_db=6.0)
    assert [x["variant"] for x in c["cliffs"]] == ["tomeb"]


def test_distribution_stable_inside_floor(tmp_path):
    # FID growth that stays under 3x the noise floor is sampling variance
    a = _write(tmp_path / "a.json", [
        {"variant": "deep5", "fid": 0.10, "cmmd": 0.0},
        {"variant": "dpm25", "fid": 0.50, "cmmd": 0.1},
    ])
    b = _write(tmp_path / "b.json", [
        {"variant": "deep5", "fid": 0.45, "cmmd": 0.0},  # 4.5x but < 3*floor
        {"variant": "dpm25", "fid": 0.60, "cmmd": 0.1},
    ])
    c = gs.compare_distribution(gs.load_rows(a), gs.load_rows(b), cliff_x=3.0)
    assert c["cliffs"] == []
    assert c["spearman"] == pytest.approx(1.0)


def test_distribution_cliff_above_floor(tmp_path):
    a = _write(tmp_path / "a.json",
               [{"variant": "tomeb", "fid": 0.2, "cmmd": 0.0},
                {"variant": "deep5", "fid": 0.1, "cmmd": 0.0}])
    b = _write(tmp_path / "b.json",
               [{"variant": "tomeb", "fid": 33.0, "cmmd": 0.25},
                {"variant": "deep5", "fid": 0.12, "cmmd": 0.0}])
    c = gs.compare_distribution(gs.load_rows(a), gs.load_rows(b), cliff_x=3.0)
    assert [x["variant"] for x in c["cliffs"]] == ["tomeb"]


def test_main_exit_code(tmp_path, capsys):
    a = _write(tmp_path / "a.json",
               [{"variant": "x", "psnr_vs_exact_db": 30.0},
                {"variant": "y", "psnr_vs_exact_db": 35.0}])
    b = _write(tmp_path / "b.json",
               [{"variant": "x", "psnr_vs_exact_db": 29.0},
                {"variant": "y", "psnr_vs_exact_db": 34.0}])
    out = tmp_path / "stab.json"
    sys_argv = sys.argv
    try:
        sys.argv = ["x", "--quality", a, b, "--out", str(out)]
        gs.main()  # stable: no SystemExit
    finally:
        sys.argv = sys_argv
    report = json.loads(out.read_text())
    assert report["stable"] is True
    assert report["comparisons"][0]["spearman"] == pytest.approx(1.0)

    bad = _write(tmp_path / "c.json",
                 [{"variant": "x", "psnr_vs_exact_db": 10.0},
                  {"variant": "y", "psnr_vs_exact_db": 34.0}])
    try:
        sys.argv = ["x", "--quality", a, bad]
        with pytest.raises(SystemExit):
            gs.main()
    finally:
        sys.argv = sys_argv
