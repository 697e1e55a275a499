#!/bin/bash
# End-of-round-4 chip pipeline: probes + strategy eval on the freshly
# retrained bb-long checkpoints (the VM re-image wiped the round-3 ones —
# NOTES_ROUND4.md). Restartable: samplers skip existing outputs and
# strategy_eval.py merges per-mode into results_artifacts/strategy_eval.json.
#
# Usage: bash baselines/round4_endgame.sh <step>   (e.g. 100000)
# Precondition: the trainer is dead (ps aux | grep "[v]ideo_train" empty).
set -euo pipefail
cd "$(dirname "$0")/.."
STEP=${1:?checkpoint step, e.g. 100000}
CKDIR=checkpoints/bb-long
EMA=$CKDIR/ema_0.9999_$(printf %06d "$STEP").pt
[ -f "$EMA" ] || EMA=$CKDIR/ema_0.9999_latest.pt

echo "=== window probe (trend table) ==="
# every step-named EMA snapshot on disk, oldest first (the archiver produces
# one per save_interval; globbing beats a hardcoded list across recipes)
PROBES=$(ls "$CKDIR"/ema_0.9999_[0-9]*.pt 2>/dev/null | sort | tr '\n' ' ')
[ -n "$PROBES" ] && python baselines/window_probe.py $PROBES \
  2>&1 | tee logs/window_probe_r4.log

echo "=== strategy eval (one invocation per mode; merged json) ==="
RESPACE=${RESPACE:-}   # empty = full DDPM-1000 (QUALITY.md protocol);
                       # RESPACE=ddim250 quarters the sampling time
for mode in autoreg independent exp-past hierarchy-2; do
  # independent folds all 19 windows x batch into ONE reverse process
  # (~12k frames per diffusion step at batch 64): a 250-step chunk would
  # trip the tunnel's ~60 s per-call deadline, so chunk it finer.
  chunk=250; [ "$mode" = independent ] && chunk=50
  # batch 32 independent OOM'd before the qkv lane-slice layout fix
  # (16.3G requested); the compile-only probe now puts it at 12.5G, so
  # run it at 32 like the others. VDT_WINDOW_FOLD=10 is the fallback if
  # the chip still faults (bounds peak HBM, noise-stream change only).
  bs=32
  VDT_T_CHUNK=$chunk python baselines/strategy_eval.py "$EMA" \
    --T 100 --n 64 --modes "$mode" --batch_size "$bs" --tag "step$STEP" \
    ${RESPACE:+--respace "$RESPACE"} \
    --eval_root "results/strategy-eval-$STEP" \
    2>&1 | tee -a logs/strategy_eval_r4.log
done
echo "=== done: results_artifacts/strategy_eval.json ==="
