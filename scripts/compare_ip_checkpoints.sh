#!/usr/bin/env bash
# Checkpoint x guidance/steer-scale comparison sweep
# (counterpart of reference scripts/compare_ip_checkpoints.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:?set DATA_DIR=path/to/limuc}
CKPTS=${CKPTS:?set CKPTS="ckpt1 ckpt2 ..."}
SCALES=${SCALES:-"0 0.5 1 1.5 2 3 5 7.5"}
python -m psd_tpu.pipelines.evaluate \
  --config configs/train_ip.yaml \
  --checkpoints $CKPTS \
  --scales $SCALES \
  --data-dir "$DATA_DIR" \
  --output-dir "${OUTPUT_DIR:-runs/compare_ip}" \
  "$@"
