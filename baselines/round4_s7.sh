#!/bin/bash
# Session-7 (post-re-image) round-4 pipeline.
#
# The re-image between sessions 6 and 7 wiped the bb64 trainer state and the
# uncommitted endgame artifacts; datasets were regenerated bit-identically
# (same seeds) at session start. This script drives the remaining chip work:
#
#   launch  — start the bb64 flagship trainer (FULL bench shape: 64x64,
#             128ch, 20-frame windows, B=8 — measured 0.34 s/step at 46.7%
#             MFU, baselines/train_step_bench.json) under the watchdog,
#             with the latest-only -> step-named archiver attached.
#   endgame — kill the trainer, then: bb64 window probe + autoreg eval,
#             masked NLL (bits/dim) of the bb-long 200k model, final bench
#             run on the A/B-chosen routing.
#
# Usage: bash baselines/round4_s7.sh launch
#        bash baselines/round4_s7.sh endgame <bb64-step>
set -uo pipefail
cd "$(dirname "$0")/.."
CMD=${1:?launch|endgame}

if [ "$CMD" = launch ]; then
  mkdir -p checkpoints/bb64 logs
  nohup bash scripts/train_watchdog.sh /tmp/bb64.pid logs/bb64.log 900 -- \
    python scripts/video_train.py \
      --dataset bouncy_balls_64 \
      --batch_size 8 \
      --max_frames 20 \
      --num_channels 128 \
      --schedule_sampler uniform \
      --lr 1e-4 \
      --save_interval 10000 \
      --sample_interval 0 \
      --save_latest_only True \
      --resume_id bb64 \
    > logs/watchdog_bb64.log 2>&1 &
  echo $! > /tmp/watchdog_bb64.pid
  nohup bash scripts/archive_latest_checkpoints.sh logs/bb64.log checkpoints/bb64 \
    > logs/archiver_bb64.log 2>&1 &
  echo $! > /tmp/archiver_bb64.pid
  echo "watchdog pid $(cat /tmp/watchdog_bb64.pid), archiver pid $(cat /tmp/archiver_bb64.pid)"
  exit 0
fi

BB64STEP=${2:?bb64 checkpoint step, e.g. 50000}
PAD=$(printf %06d "$BB64STEP")

echo "=== 1. bb64 window probe (n=16: 64x64 full chains are ~16x the 32x32 cost) ==="
python baselines/window_probe.py \
  checkpoints/bb64/ema_0.9999_"$PAD".pt \
  --T 20 --n_obs 5 --batch 16 --chunk 2 \
  --data datasets/bouncing_balls_64/test.pt \
  2>&1 | tee logs/bb64_probe.log

echo "=== 2. bb64 autoreg sample + eval (T=30 window of the 64x64 data) ==="
VDT_T_CHUNK=50 python baselines/strategy_eval.py \
  checkpoints/bb64/ema_0.9999_"$PAD".pt \
  --T 30 --n 32 --modes autoreg --batch_size 8 --max_frames 20 \
  --obs_length 5 --step_size 10 --tag "bb64-step$BB64STEP" \
  --respace ddim250 --eval_root results/bb64-eval \
  2>&1 | tee logs/bb64_eval.log

echo "=== 3. masked NLL (bits/dim) of bb-long @200k ==="
VDT_T_CHUNK=250 python scripts/video_nll.py \
  checkpoints/bb-long/ema_0.9999_200000.pt \
  --T 20 --obs_length 5 --max_frames 10 --num_videos 16 --step_size 5 \
  --eval_dir results/nll-200000 \
  2>&1 | tee logs/nll_200000.log
