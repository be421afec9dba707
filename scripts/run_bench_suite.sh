#!/bin/bash
# Full single-chip benchmark suite: every tracked metric as a JSON artifact.
#
#   bash scripts/run_bench_suite.sh [OUTDIR]    (default: bench_out/)
#
# Runs, in priority order (most critical artifacts first, so a cut-short
# run still leaves the headline numbers):
#   1. bench.py                  — headline exact img/s + turbo serving point
#   2. check_stride_quality.py   — turbo quality table (incremental writes)
#   3. bench_progression.py      — p50 13-level MES progression latency
#   4. bench_train.py            — SD-scale train step throughput
#   5. bench_batch.py            — exact-path batch sweep (B 4/8/12/16)
#   6. bench_vae.py              — VAE 512^2 decode (MFU denominator)
#
# Requires the real TPU chip (bench.py fails fast with an error JSON when
# the accelerator is unreachable). Timeouts assume a cold compile cache;
# warm-cache runs finish far earlier.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-bench_out}"
mkdir -p "$OUT"
{
  echo "=== 1/6 bench.py (headline + turbo) ==="
  timeout 3000 python bench.py | tee "$OUT/bench.json"
  echo "=== 2/6 turbo quality table ==="
  timeout 5400 python scripts/check_stride_quality.py \
    --variants "dpm25,dpm20,dpm25+tomeb0.5+deep5,tomeb0.5+deep5,tomeb0.5+deep6,enc2,enc3,deep3,deep5,tome0.5,tomeb0.5,tome0.5+deep5" \
    --out "$OUT/bench_turbo_quality.json" | tail -20
  echo "=== 3/6 progression latency ==="
  timeout 1800 python scripts/bench_progression.py --out "$OUT/bench_progression.json" | tail -2
  echo "=== 4/6 train throughput ==="
  timeout 1800 python scripts/bench_train.py --batch 8 --out "$OUT/bench_train.json" | tail -2
  echo "=== 5/6 batch sweep ==="
  timeout 3600 python scripts/bench_batch.py --batches 4,8,12,16 | tee "$OUT/bench_batch.log" | tail -8
  echo "=== 6/6 VAE decode ==="
  timeout 1200 python scripts/bench_vae.py --batch 8 --size 512 | tee "$OUT/bench_vae.log" | tail -4
  echo "BENCH-SUITE-DONE -> $OUT/"
} 2>&1 | tee -a "$OUT/suite.log"
