#!/bin/bash
# Session-6 end-of-round-4 chip pipeline, run AFTER the bb64 trainer is dead
# (kill watchdog first: /tmp/watchdog_bb64.pid, then /tmp/bb64.pid, verify
# with `ps aux | grep "[v]ideo_train"`).
#
#   1. bb64 window probe (conditioning trend at the flagship 64x64 shape)
#   2. bb64 autoreg sample + eval (first trained-weights metrics at the
#      bench-size config)
#   3. attention-routing bench A/B (bench_ab_r4.sh) on the idle chip
#   4. masked-NLL (bits/dim) of the trained 200k bb-long model — first
#      trained-weights exercise of the video_nll surface
#
# The step-200000 strategy eval (session-5 item 1) already ran and is
# committed (results_artifacts/strategy_eval.json["step200000"]).
#
# Restartable: samplers skip existing outputs; strategy_eval.py merges
# per-mode rows into the json.
#
# Usage: bash baselines/round4_endgame_s6.sh <bb64-step>   (e.g. 50000)
set -uo pipefail
cd "$(dirname "$0")/.."
BB64STEP=${1:?bb64 checkpoint step, e.g. 50000}
PAD=$(printf %06d "$BB64STEP")

echo "=== 1. bb64 window probe ==="
python baselines/window_probe.py \
  checkpoints/bb64/ema_0.9999_"$PAD".pt \
  --data datasets/bouncing_balls_64/test.pt --chunk 8 \
  2>&1 | tee logs/bb64_probe.log

echo "=== 2. bb64 autoreg sample + eval (T=30 window of the 64x64 data) ==="
# 64x64 frames are ~16x the 32x32 compute: bound the reverse chain per call
# and use a smaller batch; T=30 keeps the whole run ~an hour.
VDT_T_CHUNK=50 python baselines/strategy_eval.py \
  checkpoints/bb64/ema_0.9999_"$PAD".pt \
  --T 30 --n 32 --modes autoreg --batch_size 8 --max_frames 20 \
  --obs_length 5 --step_size 10 --tag "bb64-step$BB64STEP" \
  --respace ddim250 --eval_root results/bb64-eval \
  2>&1 | tee logs/bb64_eval.log

echo "=== 3. attention-routing bench A/B ==="
bash baselines/bench_ab_r4.sh 2>&1 | tee logs/bench_ab_s6.log

echo "=== 4. masked NLL (bits/dim) of bb-long @200k ==="
VDT_T_CHUNK=250 python scripts/video_nll.py \
  checkpoints/bb-long/ema_0.9999_200000.pt \
  --T 20 --obs_length 5 --max_frames 10 --num_videos 16 --step_size 5 \
  --eval_dir results/nll-200000 \
  2>&1 | tee logs/nll_200000.log
