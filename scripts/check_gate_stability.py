"""Gate-stability check: is the turbo-variant ranking stable vs training length?

Round 4's lesson (VERDICT r4 weak #6): gate verdicts move with weight
structure — block-ToMe scored 85 dB on random init and collapsed to
15-16 dB at 500 synthetic steps. 500 steps is itself a single point, so
this script compares two or more committed gate artifacts taken at
DIFFERENT --train-steps and reports:

  - Spearman rank correlation of the variant ordering (per metric);
  - per-variant deltas, flagging CLIFFS: a PSNR drop > --psnr-cliff dB
    (quality tables) or a FID that grows by more than --fid-cliff x
    while leaving the noise floor (distribution tables);
  - a verdict line: STABLE / UNSTABLE(+ which variants moved).

Usage:
  python scripts/check_gate_stability.py \
      --quality bench_out/bench_turbo_quality.json \
                bench_out/bench_turbo_quality_1500.json \
      --distribution bench_out/bench_turbo_distribution.json \
                     bench_out/bench_turbo_distribution_1500.json \
      [--out bench_out/gate_stability.json]

Exit code 1 if any compared pair is UNSTABLE — the recommended operating
points in docs/serving.md must then be revisited.
"""

from __future__ import annotations

import argparse
import itertools
import json
from pathlib import Path


def spearman(xs, ys) -> float:
    """Spearman rho without scipy (average ranks for ties)."""
    def ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r
    rx, ry = ranks(xs), ranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx) ** 0.5
    dy = sum((b - my) ** 2 for b in ry) ** 0.5
    return max(-1.0, min(1.0, num / (dx * dy))) if dx and dy else 1.0


def load_rows(path: str) -> dict:
    data = json.loads(Path(path).read_text())
    rows = {r["variant"]: r for r in data["rows"]}
    return {"rows": rows, "weights": data.get("weights", "?"),
            "floor": data.get("noise_floor_fresh_seeds")}


def compare_quality(a: dict, b: dict, cliff_db: float) -> dict:
    """Quality tables: rank on psnr_vs_exact_db (higher = better)."""
    common = sorted(set(a["rows"]) & set(b["rows"]))
    key = "psnr_vs_exact_db"
    xs = [a["rows"][v][key] for v in common]
    ys = [b["rows"][v][key] for v in common]
    cliffs = [
        {"variant": v, "from_db": xs[i], "to_db": ys[i]}
        for i, v in enumerate(common) if xs[i] - ys[i] > cliff_db
    ]
    return {"kind": "quality", "metric": key, "variants": common,
            "spearman": round(spearman(xs, ys), 4),
            "cliffs": cliffs,
            "weights_a": a["weights"], "weights_b": b["weights"]}


def compare_distribution(a: dict, b: dict, cliff_x: float) -> dict:
    """Distribution tables: rank on FID vs exact (lower = better).

    A cliff = FID grows >cliff_x times AND ends above 3x the run's own
    noise floor (growth inside the floor is sampling variance, not a
    collapse)."""
    common = sorted(set(a["rows"]) & set(b["rows"]))
    xs = [a["rows"][v]["fid"] for v in common]
    ys = [b["rows"][v]["fid"] for v in common]
    floor_b = (b.get("floor") or {}).get("fid", 0.0)
    cliffs = [
        {"variant": v, "from_fid": xs[i], "to_fid": ys[i]}
        for i, v in enumerate(common)
        if ys[i] > max(xs[i], 1e-9) * cliff_x and ys[i] > 3.0 * floor_b
    ]
    return {"kind": "distribution", "metric": "fid", "variants": common,
            "spearman": round(spearman(xs, ys), 4),
            "cliffs": cliffs, "noise_floor_b_fid": floor_b,
            "weights_a": a["weights"], "weights_b": b["weights"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", nargs="*", default=[],
                    help="2+ bench_turbo_quality artifacts (different "
                         "--train-steps)")
    ap.add_argument("--distribution", nargs="*", default=[],
                    help="2+ bench_turbo_distribution artifacts")
    ap.add_argument("--psnr-cliff", type=float, default=6.0,
                    help="quality cliff: PSNR drop in dB")
    ap.add_argument("--fid-cliff", type=float, default=3.0,
                    help="distribution cliff: FID growth factor")
    ap.add_argument("--min-spearman", type=float, default=0.7)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    comparisons = []
    for paths, fn, arg in ((args.quality, compare_quality, args.psnr_cliff),
                           (args.distribution, compare_distribution,
                            args.fid_cliff)):
        loaded = [(p, load_rows(p)) for p in paths]
        for (pa, a), (pb, b) in itertools.combinations(loaded, 2):
            c = fn(a, b, arg)
            c["artifact_a"], c["artifact_b"] = pa, pb
            c["stable"] = (c["spearman"] >= args.min_spearman
                           and not c["cliffs"])
            comparisons.append(c)
            print(json.dumps(c))

    verdict = all(c["stable"] for c in comparisons) if comparisons else None
    report = {"metric": "gate_ranking_stability",
              "stable": verdict,
              "min_spearman": args.min_spearman,
              "comparisons": comparisons}
    print(json.dumps({"metric": report["metric"], "stable": verdict,
                      "n_comparisons": len(comparisons)}))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))
    if verdict is False:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
