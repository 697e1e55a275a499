#!/bin/bash
# Archive step-named snapshots of a save_latest_only=True training run by
# copying checkpoints/<run>/{model,ema_*,opt}_latest.pt to *_<step>.pt after
# each "saved checkpoint at step N" line appears in the trainer log. Purely
# host-side: lets a running trainer keep its cheap latest-only saves while
# still accumulating the per-step checkpoint trail that window_probe.py /
# round4_endgame.sh consume. Saves are atomic (tmp+rename, utils/
# checkpoint.py), so copying a few seconds after the log line is safe.
#
# Usage: bash scripts/archive_latest_checkpoints.sh <trainer-log> <ckpt-dir>
#
# If PROBE_DATA is set (path to a test .pt), each archived EMA is also run
# through the conditioning-emergence probe (baselines/eps_gap_probe.py) on
# CPU — the trainer keeps the TPU — and the JSON lines accumulate in
# <ckpt-dir>/eps_gap.jsonl, so emergence is visible in-cadence instead of
# being discovered in the endgame (VERDICT r5 item 1).
set -u
LOG=$1; DIR=$2
seen=""
while true; do
  # only the NEWEST unseen step is archivable: *_latest.pt holds exactly the
  # most recent save, so any older step we missed is gone — mark it seen
  # without copying rather than mislabel current weights with an old step.
  steps=$(grep -ao "saved checkpoint at step [0-9]*" "$LOG" 2>/dev/null |
          awk '{print $5}' | sort -un)
  newest=$(echo "$steps" | tail -1)
  for s in $steps; do
    case " $seen " in *" $s "*) continue;; esac
    if [ "$s" != "$newest" ]; then
      seen="$seen $s"; echo "[archiver] step $s missed (stale), skipping"
      continue
    fi
    pad=$(printf %06d "$s")
    sleep 5  # let all three renames land
    ok=1
    for f in "$DIR"/*_latest.pt; do
      [ -f "$f" ] || { ok=0; break; }
      dst="${f%_latest.pt}_$pad.pt"
      [ -f "$dst" ] || cp "$f" "$dst" || ok=0
    done
    [ "$ok" = 1 ] && { seen="$seen $s"; echo "[archiver] step $s archived"; }
    if [ "$ok" = 1 ] && [ -n "${PROBE_DATA:-}" ]; then
      ema=$(ls "$DIR"/ema_*_"$pad".pt 2>/dev/null | head -1)
      [ -n "$ema" ] && JAX_PLATFORMS=cpu python baselines/eps_gap_probe.py \
        "$ema" --data "$PROBE_DATA" --T "${PROBE_T:-20}" \
        --n_obs "${PROBE_NOBS:-5}" --batch 16 --t 500 700 \
        >> "$DIR/eps_gap.jsonl" 2>> "$DIR/eps_gap.err" \
        && echo "[archiver] step $s probed: $(tail -1 "$DIR/eps_gap.jsonl")"
    fi
  done
  sleep 30
done
