#!/bin/bash
# Session-5 end-of-round-4 chip pipeline, run AFTER the bb64 trainer is dead:
#   1. strategy eval on the bb-long 200k checkpoint (same DDIM-250/T=100/n=64
#      protocol as the 30k run, so the two tables are comparable rows of
#      results_artifacts/strategy_eval.json)
#   2. window probe + one autoreg sample/eval on the trained bb64 flagship
#      (first trained-weights exercise of the 64x64 bench-size config)
#   3. attention-routing bench A/B (bench_ab_r4.sh) on the idle chip
#
# Restartable: samplers skip existing outputs; strategy_eval.py merges
# per-mode rows into the json.
#
# Usage: bash baselines/round4_endgame_s5.sh <bb64-step>   (e.g. 60000)
set -uo pipefail
cd "$(dirname "$0")/.."
BB64STEP=${1:?bb64 checkpoint step, e.g. 60000}

echo "=== 1. strategy eval @ bb-long 200k (4 modes, DDIM-250, n=64) ==="
for mode in autoreg exp-past hierarchy-2 independent; do
  chunk=250; [ "$mode" = independent ] && chunk=50
  VDT_T_CHUNK=$chunk python baselines/strategy_eval.py \
    checkpoints/bb-long/ema_0.9999_200000.pt \
    --T 100 --n 64 --modes "$mode" --batch_size 32 --tag step200000 \
    --respace ddim250 --eval_root results/strategy-eval-200000 \
    2>&1 | tee -a logs/strategy_eval_s5.log
done

echo "=== 2a. bb64 window probe ==="
python baselines/window_probe.py \
  checkpoints/bb64/ema_0.9999_$(printf %06d "$BB64STEP").pt \
  --data datasets/bouncing_balls_64/test.pt --chunk 8 \
  2>&1 | tee logs/bb64_probe.log

echo "=== 2b. bb64 autoreg sample + eval (T=30 window of the 64x64 data) ==="
# 64x64 frames are ~16x the 32x32 compute: bound the reverse chain per call
# and use a smaller batch; T=30 keeps the whole run ~an hour.
VDT_T_CHUNK=50 python baselines/strategy_eval.py \
  checkpoints/bb64/ema_0.9999_$(printf %06d "$BB64STEP").pt \
  --T 30 --n 32 --modes autoreg --batch_size 8 --max_frames 20 \
  --obs_length 5 --step_size 10 --tag "bb64-step$BB64STEP" \
  --respace ddim250 --eval_root results/bb64-eval \
  2>&1 | tee logs/bb64_eval.log

echo "=== 3. attention-routing bench A/B ==="
bash baselines/bench_ab_r4.sh 2>&1 | tee logs/bench_ab_s5.log
