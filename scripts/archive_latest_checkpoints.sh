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
  done
  sleep 30
done
