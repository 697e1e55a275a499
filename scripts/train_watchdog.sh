#!/bin/bash
# Watchdog for a training run driven through a remote-TPU tunnel: the tunnel
# can wedge a device call indefinitely (observed round 4: trainer frozen
# mid-step with ~0 CPU accrual). Auto-resume makes restarts safe (SURVEY
# 5.3 restart-based recovery), so watch the kv-log dump counter and restart
# the trainer when it stops advancing.
#
# Usage: bash scripts/train_watchdog.sh <pidfile> <trainer-log> \
#          <stall-seconds> -- <trainer command...>
# The trainer command is re-launched with nohup, appending to <trainer-log>;
# its python PID is written to <pidfile>. Never kills by pattern.
set -u
PIDFILE=$1; LOG=$2; STALL=$3; shift 3
[ "$1" = "--" ] && shift

count_progress() {
  # total kv dump count across every openai logdir (cheap: grep -c, no jax
  # imports). Summing instead of "newest dir" keeps the counter monotone
  # when other processes (pytest, probes) create their own /tmp/openai-*
  # dirs after the trainer's.
  # grep -c prints the count even when it is 0 (exit code 1), so capture
  # rather than `|| echo 0` (which would emit a second line on zero).
  local n
  n=$(cat /tmp/openai-*/log.txt 2>/dev/null | grep -ac "| step ")
  echo "${n:-0}"
}

restart() {
  local pid
  pid=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "${pid:-}" ] && kill -0 "$pid" 2>/dev/null; then
    kill "$pid"; sleep 5
    kill -0 "$pid" 2>/dev/null && { kill -9 "$pid"; sleep 3; }
  fi
  nohup "$@" >> "$LOG" 2>&1 &
  local shpid=$!
  sleep 2
  # resolve the python child (nohup/bash wrapper may be the parent)
  local py
  py=$(pgrep -P "$shpid" 2>/dev/null | head -1)
  echo "${py:-$shpid}" > "$PIDFILE"
  echo "[watchdog] restarted trainer pid $(cat "$PIDFILE") at $(date -u +%H:%M:%S)"
}

last=$(count_progress); lastchange=$(date +%s)
while true; do
  sleep 60
  cur=$(count_progress); now=$(date +%s)
  if [ "$cur" != "$last" ]; then
    last=$cur; lastchange=$now; continue
  fi
  if [ $((now - lastchange)) -ge "$STALL" ]; then
    echo "[watchdog] no progress for $((now - lastchange))s — restarting"
    restart "$@"
    lastchange=$(date +%s)
    # new logdir appears after restart; reset the baseline
    sleep 120; last=$(count_progress)
  fi
done
