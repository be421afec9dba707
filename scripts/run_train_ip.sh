#!/usr/bin/env bash
# Full DADD IP training (counterpart of reference scripts/run_train_ip.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m psd_tpu.pipelines.train \
  --config configs/train_ip.yaml \
  --output-dir "${OUTPUT_DIR:-runs/train_ip}" \
  "$@"
