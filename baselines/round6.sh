#!/bin/bash
# Round-6 chip pipeline (final round; VERDICT r5 punch list).
#
#   launch   — resume the bb64 flagship trainer (64x64, 128ch, 20-frame
#              windows, B=8) from the step-25000 trio under the watchdog,
#              save_interval 2500 (round-5 wedge-exposure policy), with the
#              archiver ALSO running the eps-gap conditioning-emergence
#              probe per checkpoint on CPU (VERDICT r5 item 1: emergence
#              must be visible in-cadence, not discovered in the endgame).
#   schedule — optimal-schedule search end-to-end on bb-long 200k
#              (VERDICT r5 item 3): search -> optimal_schedule.pt ->
#              sample with --optimal_schedule_path -> metrics vs plain
#              autoreg. Hours-cheap protocol: T=30, ddim50 eval traces.
#   adaptive — adaptive-autoreg + adaptive-hierarchy-2 at n=64 with KID
#              (VERDICT r5 item 5), same protocol as the strategy table.
#   quality  — 64x64 quality protocol on a conditioned bb64 checkpoint
#              (VERDICT r5 item 2): FVD-512 + strategy rows at 64x64.
#   longvid  — one T>=300 video_sample_long chain at 64x64 (item 7).
#
# Usage: bash baselines/round6.sh launch
#        bash baselines/round6.sh schedule
#        bash baselines/round6.sh adaptive
#        bash baselines/round6.sh quality <bb64-step>
#        bash baselines/round6.sh longvid <bb64-step>
set -uo pipefail
cd "$(dirname "$0")/.."
CMD=${1:?launch|schedule|adaptive|quality|longvid}

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
      --save_interval 2500 \
      --sample_interval 0 \
      --save_latest_only True \
      --resume_id bb64 \
    > logs/watchdog_bb64.log 2>&1 &
  echo $! > /tmp/watchdog_bb64.pid
  PROBE_DATA=datasets/bouncing_balls_64/test.pt PROBE_T=20 PROBE_NOBS=5 \
  nohup bash scripts/archive_latest_checkpoints.sh logs/bb64.log checkpoints/bb64 \
    > logs/archiver_bb64.log 2>&1 &
  echo $! > /tmp/archiver_bb64.pid
  echo "watchdog pid $(cat /tmp/watchdog_bb64.pid), archiver pid $(cat /tmp/archiver_bb64.pid)"
  exit 0
fi

if [ "$CMD" = schedule ]; then
  # Search writes <derived-eval-dir>/optimal_schedule.pt; sampling with the
  # SAME --optimality + strategy params derives the same dir and consumes it
  # (reference video_optimal_schedule.py:222-354, inference_util.py:95-103).
  CKPT=checkpoints/bb-long/ema_0.9999_200000.pt
  OPT=linspace-t-force-nearby
  mkdir -p logs
  # search + consume must share --timestep_respacing: the derived eval dir
  # (results/bb-long/ema_0.9999_200000_respaceddim250/<identifier>) embeds it
  VDT_T_CHUNK=50 python scripts/video_optimal_schedule.py "$CKPT" \
    --inference_mode autoreg --optimality "$OPT" \
    --T 30 --obs_length 5 --max_frames 10 --step_size 5 \
    --num_videos 4 --num_t 10 --timestep_respacing ddim250 \
    2>&1 | tee logs/optimal_schedule_search.log
  for arm in plain optimal; do
    extra=""
    [ "$arm" = optimal ] && extra="--optimality $OPT"
    VDT_T_CHUNK=50 python scripts/video_sample.py "$CKPT" \
      --inference_mode autoreg --obs_length 5 --step_size 5 --max_frames 10 \
      --T 30 --subset_size 64 --batch_size 16 --num_samples 1 \
      --timestep_respacing ddim250 $extra \
      2>&1 | tee "logs/sched_sample_$arm.log"
  done
  for d in results/bb-long/ema_0.9999_200000_respaceddim250/autoreg_10_5_30_5 \
           results/bb-long/ema_0.9999_200000_respaceddim250/autoreg_optimal-"$OPT"_10_5_30_5; do
    [ -d "$d" ] && python scripts/video_eval.py --eval_dir "$d" \
      --obs_length 5 --T 30 --modes fvd ssim \
      2>&1 | tee -a logs/sched_eval.log
  done
  exit 0
fi

if [ "$CMD" = adaptive ]; then
  for mode in adaptive-autoreg adaptive-hierarchy-2; do
    VDT_T_CHUNK=50 python baselines/strategy_eval.py \
      checkpoints/bb-long/ema_0.9999_200000.pt \
      --T 30 --n 64 --modes "$mode" --batch_size 8 --max_frames 10 \
      --obs_length 5 --step_size 10 --tag "bb-long-200k" \
      --respace ddim250 --eval_root "results/adaptive-eval-r6" \
      2>&1 | tee -a logs/adaptive_eval_r6.log
  done
  exit 0
fi

BB64STEP=${2:?bb64 checkpoint step}
PAD=$(printf %06d "$BB64STEP")

if [ "$CMD" = quality ]; then
  # 512-video 64x64 test split (independent seeding preserves train split)
  [ -f datasets/bouncing_balls_64/test512.flag ] || {
    python datasets/bouncy_balls.py --out_dir datasets/bouncing_balls_64 \
      --n_test 512 --res 64 --only_split test &&
    touch datasets/bouncing_balls_64/test512.flag; }
  VDT_T_CHUNK=50 python scripts/video_sample.py \
    checkpoints/bb64/ema_0.9999_"$PAD".pt \
    --inference_mode autoreg --obs_length 5 --step_size 10 --max_frames 20 \
    --T 30 --subset_size 512 --batch_size 8 --num_samples 1 \
    --timestep_respacing ddim250 --eval_dir results/fvd512-bb64 \
    2>&1 | tee logs/fvd512_bb64_sample.log
  python scripts/video_eval.py --eval_dir results/fvd512-bb64/autoreg_20_10_30_5 \
    --obs_length 5 --T 30 --modes fvd ssim \
    2>&1 | tee logs/fvd512_bb64_eval.log
  for mode in autoreg independent exp-past hierarchy-2; do
    VDT_T_CHUNK=50 python baselines/strategy_eval.py \
      checkpoints/bb64/ema_0.9999_"$PAD".pt \
      --T 30 --n 32 --modes "$mode" --batch_size 8 --max_frames 20 \
      --obs_length 5 --step_size 10 --tag "bb64-step$BB64STEP" \
      --respace ddim250 --eval_root "results/bb64-eval-r6" \
      2>&1 | tee -a logs/bb64_strategy_r6.log
  done
  exit 0
fi

if [ "$CMD" = longvid ]; then
  VDT_T_CHUNK=50 python scripts/video_sample_long.py \
    checkpoints/bb64/ema_0.9999_"$PAD".pt \
    --inference_mode autoreg --obs_length 5 --step_size 10 --max_frames 20 \
    --T 300 --batch_size 2 --subset_size 2 \
    --timestep_respacing ddim250 --eval_dir results/long300-bb64 \
    2>&1 | tee logs/long300_bb64.log
  exit 0
fi
