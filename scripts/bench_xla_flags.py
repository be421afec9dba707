"""Sweep process-level XLA/libtpu flags over the full UNet step timing.

XLA compiler flags are fixed at process start, so each variant runs
`profile_ablate.py --variants full` in a subprocess with a different
XLA_FLAGS value and parses the ms/step line. Compile-cache persistence
(utils/fast_init.enable_compile_cache) keys on the flag string, so
repeat sweeps are cheap.

  python scripts/bench_xla_flags.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

VARIANTS = {
    "default": "",
    "scoped_vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
}


def run_one(name: str, flags: str, batch: int) -> float | None:
    env = dict(os.environ)
    if flags:
        # xla_tpu_* are libtpu flags — XLA_FLAGS rejects them as unknown
        env["LIBTPU_INIT_ARGS"] = (
            env.get("LIBTPU_INIT_ARGS", "") + " " + flags
        ).strip()
    p = subprocess.run(
        [sys.executable, str(ROOT / "scripts/profile_ablate.py"),
         "--variants", "full", "--batch", str(batch)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    m = re.search(r"full\s+([0-9.]+) ms/step", p.stdout)
    if not m:
        print(f"{name:20s} FAILED rc={p.returncode}")
        tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
        for line in tail:
            print(f"    {line}")
        return None
    t = float(m.group(1))
    print(f"{name:20s} {t:8.2f} ms/step   [{flags or 'baseline'}]")
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved rounds; report per-variant min")
    args = ap.parse_args()
    names = [n for n in VARIANTS if not args.only or n in args.only.split(",")]
    best: dict[str, float] = {}
    for r in range(args.rounds):
        print(f"-- round {r}")
        for n in names:
            t = run_one(n, VARIANTS[n], args.batch)
            if t is not None:
                best[n] = min(best.get(n, 1e9), t)
    print("-- per-variant min")
    for n, t in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{n:20s} {t:8.2f} ms/step")


if __name__ == "__main__":
    main()
