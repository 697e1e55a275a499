#!/bin/bash
# Single-host training launch (counterpart of the reference's torchrun train.sh).
# JAX SPMD uses all local TPU chips from one process; no per-GPU process farm.
set -e
DATASET=${DATASET:-carla_no_traffic}
BATCH_SIZE=${BATCH_SIZE:-8}
MAX_FRAMES=${MAX_FRAMES:-20}
export OPENAI_LOGDIR=${OPENAI_LOGDIR:-logs}
python scripts/video_train.py \
  --dataset "$DATASET" \
  --batch_size "$BATCH_SIZE" \
  --max_frames "$MAX_FRAMES" \
  --sample_interval 50000 \
  --save_latest_only True \
  "$@"
