#!/usr/bin/env bash
# Steer-scale sweep of the synthetic dataset factory
# (counterpart of reference scripts/run_augment_sweep.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:?set DATA_DIR=path/to/limuc}
for scale in ${SCALES:-1.0 2.0 3.0}; do
  python -m psd_tpu.pipelines.augment \
    --config configs/train_ip.yaml \
    --checkpoint "${CKPT:-runs/train_ip/checkpoints}" \
    --data-dir "$DATA_DIR" \
    --output-dir "outputs/augmented_scale${scale}" \
    --steer-scale "$scale" \
    --copy-splits \
    "$@"
done
