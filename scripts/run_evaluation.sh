#!/usr/bin/env bash
# Metric evaluation example (counterpart of reference scripts/run_evaluation.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:?set DATA_DIR=path/to/limuc}
python -m psd_tpu.pipelines.evaluate \
  --config configs/train_ip.yaml \
  --checkpoints "${CKPT:-runs/train_ip/checkpoints}" \
  --scales 1.0 2.0 3.0 \
  --data-dir "$DATA_DIR" \
  --output-dir "${OUTPUT_DIR:-runs/eval}" \
  "$@"
