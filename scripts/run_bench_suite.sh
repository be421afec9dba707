#!/bin/bash
# Full single-chip benchmark suite: every tracked metric as a JSON artifact.
#
#   bash scripts/run_bench_suite.sh [OUTDIR]    (default: bench_out/)
#
# Runs, in priority order (most critical artifacts first, so a cut-short
# run still leaves the headline numbers):
#   1. bench.py                      — headline exact img/s + turbo point + MFU/ceiling
#   2. check_stride_quality.py       — turbo quality table on TRAINED weights
#   3. check_turbo_distribution.py   — FID/CMMD exact-vs-turbo distribution gate
#   4. bench_progression.py          — p50 13-level MES progression latency
#   5. bench_train.py                — SD-scale train step throughput
#   6. bench_batch.py                — exact-path batch sweep (B 4/8/12/16)
#   7. bench_vae.py                  — VAE 512^2 decode (MFU denominator)
#
# Requires the real TPU chip (bench.py fails fast with an error JSON when
# the accelerator is unreachable). Timeouts assume a cold compile cache;
# warm-cache runs finish far earlier.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-bench_out}"
mkdir -p "$OUT"
{
  echo "=== 1/7 bench.py (headline + turbo + MFU) ==="
  timeout 3000 python bench.py | tee "$OUT/bench.json"
  echo "=== 2/7 turbo quality table (trained weights) ==="
  timeout 5400 python scripts/check_stride_quality.py --train-steps 500 \
    --variants "dpm25,dpm20,dpm25+deep5,dpm25+tome0.5+deep5,dpm25+tomeb0.5+deep5,tomeb0.5+deep5,enc2,enc3,deep3,deep5,tome0.5,tomeb0.5,tome0.5+deep5" \
    --out "$OUT/bench_turbo_quality.json" | tail -20
  echo "=== 3/7 turbo distribution gate (FID/CMMD) ==="
  timeout 5400 python scripts/check_turbo_distribution.py --train-steps 500 \
    --out "$OUT/bench_turbo_distribution.json" | tail -14
  echo "=== 4/7 progression latency ==="
  timeout 1800 python scripts/bench_progression.py --out "$OUT/bench_progression.json" | tail -2
  echo "=== 5/7 train throughput ==="
  timeout 1800 python scripts/bench_train.py --batch 8 --out "$OUT/bench_train.json" | tail -2
  echo "=== 6/7 batch sweep ==="
  timeout 3600 python scripts/bench_batch.py --batches 4,8,12,16 \
    --out "$OUT/bench_batch.json" | tail -8
  echo "=== 7/7 VAE decode ==="
  timeout 1200 python scripts/bench_vae.py --batch 8 --size 512 \
    --out "$OUT/bench_vae.json" | tail -4
  echo "BENCH-SUITE-DONE -> $OUT/"
} 2>&1 | tee -a "$OUT/suite.log"
