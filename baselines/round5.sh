#!/bin/bash
# Round-5 chip pipeline.
#
#   launch       — start the bb64 flagship trainer (64x64, 128ch, 20-frame
#                  windows, B=8) under the watchdog with save_interval 5000
#                  and the latest-only -> step-named archiver attached.
#   endgame      — run AFTER the trainer is dead (kill watchdog
#                  /tmp/watchdog_bb64.pid then trainer /tmp/bb64.pid, verify
#                  with ps aux | grep "[v]ideo_train"):
#                    1. bb64 window probe over all archived EMAs
#                    2. bb64 strategy eval: 5 modes incl adaptive-autoreg
#                       (first on-device run of the host-in-the-loop adaptive
#                       sampler, VERDICT r4 item 3)
#                    3. non-degenerate FVD: 512 sampled videos from the
#                       bb-long 200k model vs the 512-video test split
#                       (> 400-dim I3D features, VERDICT r4 item 2)
#                    4. dot_bf16 attention A/B on bench.py
#
# Usage: bash baselines/round5.sh launch
#        bash baselines/round5.sh endgame <bb64-step>
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
      --save_interval 5000 \
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

BB64STEP=${2:?bb64 checkpoint step, e.g. 45000}
PAD=$(printf %06d "$BB64STEP")

echo "=== 1. bb64 window probe (trend over archived EMAs) ==="
PROBES=$(ls checkpoints/bb64/ema_0.9999_[0-9]*.pt 2>/dev/null | sort | tr '\n' ' ')
[ -n "$PROBES" ] && python baselines/window_probe.py $PROBES \
  --T 20 --n_obs 5 --batch 16 --chunk 2 \
  --data datasets/bouncing_balls_64/test.pt \
  2>&1 | tee logs/bb64_probe_r5.log

echo "=== 2. bb64 strategy eval (incl. adaptive-autoreg) ==="
for mode in autoreg independent exp-past hierarchy-2 adaptive-autoreg; do
  bs=8
  VDT_T_CHUNK=50 python baselines/strategy_eval.py \
    checkpoints/bb64/ema_0.9999_"$PAD".pt \
    --T 30 --n 32 --modes "$mode" --batch_size "$bs" --max_frames 20 \
    --obs_length 5 --step_size 10 --tag "bb64-step$BB64STEP" \
    --respace ddim250 --eval_root "results/bb64-eval-r5" \
    2>&1 | tee -a logs/bb64_strategy_r5.log
done

echo "=== 3. non-degenerate FVD (512 videos, bb-long 200k) ==="
VDT_T_CHUNK=250 python scripts/video_sample.py \
  checkpoints/bb-long/ema_0.9999_200000.pt \
  --inference_mode autoreg --obs_length 5 --step_size 5 --max_frames 10 \
  --T 30 --subset_size 512 --batch_size 32 --num_samples 1 \
  --timestep_respacing ddim250 --eval_dir results/fvd512 \
  2>&1 | tee logs/fvd512_sample.log
python scripts/video_eval.py --eval_dir results/fvd512/autoreg_10_5_30_5 \
  --obs_length 5 --T 30 --modes fvd ssim \
  2>&1 | tee logs/fvd512_eval.log

echo "=== 4. dot_bf16 attention A/B ==="
for flag in 0 1; do
  VDT_ATTN_DOT_BF16=$flag BENCH_ITERS=2 python bench.py \
    2>&1 | tee -a logs/bench_dotbf16_ab.log
done
echo "=== done ==="
