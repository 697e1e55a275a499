#!/bin/bash
# Parallel sampling farm-out: shard the test set across task ids
# (counterpart of the reference's sample.sh). Usage:
#   CKPT=checkpoints/<run>/ema_0.9999_latest.pt MODE=autoreg ./sample.sh 0 7
set -e
CKPT=${CKPT:?set CKPT to a checkpoint path}
MODE=${MODE:-autoreg}
FIRST=${1:-0}
LAST=${2:-0}
for TASK in $(seq "$FIRST" "$LAST"); do
  python scripts/video_sample.py "$CKPT" \
    --inference_mode "$MODE" \
    --task_id "$TASK" \
    "${@:3}"
done
