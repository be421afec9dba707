#!/usr/bin/env bash
# MES progression inference over one or more checkpoints
# (counterpart of reference scripts/run_inference.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
CKPTS=${CKPTS:-"runs/train_ip/checkpoints"}
STRUCTURE_IMAGE=${STRUCTURE_IMAGE:?set STRUCTURE_IMAGE=path/to/image}
for ckpt in $CKPTS; do
  python -m psd_tpu.pipelines.infer \
    --config configs/train_ip.yaml \
    --checkpoint "$ckpt" \
    --structure-image "$STRUCTURE_IMAGE" \
    --mes-steps "${MES_STEPS:-13}" \
    --steer-scale "${STEER_SCALE:-1.0}" \
    --output-dir "outputs/progression_$(basename "$ckpt")" \
    "$@"
done
