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
  # total kv dump count across the logdirs THIS run announced ("Logging to
  # /tmp/openai-..." header lines in LOG — one per trainer (re)start).
  # Counting only announced dirs keeps foreign processes (probes, pytest)
  # from masking a stall: observed 2026-08-20, a measure_train_step probe's
  # own "| step" dumps reset the stall timer while the trainer sat wedged
  # for >1 h. Summing across all announced dirs keeps the counter monotone
  # across watchdog restarts.
  # grep -c prints the count even when it is 0 (exit code 1), so capture
  # rather than `|| echo 0` (which would emit a second line on zero).
  local dirs n
  dirs=$(grep -ao "Logging to /tmp/openai-[0-9-]*" "$LOG" 2>/dev/null |
         awk '{print $3}' | sort -u)
  [ -z "$dirs" ] && { echo 0; return; }
  n=$(for d in $dirs; do cat "$d"/log.txt 2>/dev/null; done | grep -ac "| step ")
  echo "${n:-0}"
}

log_writers() {
  # Every pid (other than this watchdog) holding LOG open — resolved by
  # inode through /proc/*/fd, NOT by command-line pattern. This is the
  # ground truth for "a trainer is attached to this run": a stale pidfile
  # (observed round 4: the pidfile held a dead wrapper's pid, restart()
  # killed it, and the real trainer survived → two trainers contending on
  # the one chip) cannot fool it.
  local target pid
  target=$(readlink -f "$LOG" 2>/dev/null) || return 0
  for pid in /proc/[0-9]*; do
    pid=${pid#/proc/}
    [ "$pid" = "$$" ] && continue
    for fd in /proc/"$pid"/fd/*; do
      if [ "$(readlink -f "$fd" 2>/dev/null)" = "$target" ]; then
        echo "$pid"
        break
      fi
    done
  done
}

kill_pid() {
  kill -0 "$1" 2>/dev/null || return 0
  kill "$1"; sleep 5
  kill -0 "$1" 2>/dev/null && { kill -9 "$1"; sleep 3; }
}

restart() {
  local pid
  pid=$(cat "$PIDFILE" 2>/dev/null)
  [ -n "${pid:-}" ] && kill_pid "$pid"
  # belt-and-braces: also kill anything still writing the trainer log
  for pid in $(log_writers); do
    echo "[watchdog] killing residual log-writer pid $pid"
    kill_pid "$pid"
  done
  nohup "$@" >> "$LOG" 2>&1 &
  local shpid=$!
  sleep 2
  # resolve the python child (nohup/bash wrapper may be the parent)
  local py
  py=$(pgrep -P "$shpid" 2>/dev/null | head -1)
  echo "${py:-$shpid}" > "$PIDFILE"
  echo "[watchdog] restarted trainer pid $(cat "$PIDFILE") at $(date -u +%H:%M:%S)"
}

cpu_time() {
  # cumulative utime+stime ticks of the recorded trainer pid (0 if dead).
  # A wedged tunnel call leaves the trainer blocked at ~0 CPU accrual; a
  # long first XLA compile keeps the CPU counter climbing. Counting accrual
  # as progress stops the watchdog from killing a trainer mid-compile
  # (observed round 4: a 420 s stall window < the ~8 min first compile
  # through the tunnel caused a restart churn).
  local pid stat
  pid=$(cat "$PIDFILE" 2>/dev/null) || { echo 0; return; }
  stat=$(cat /proc/"${pid:-0}"/stat 2>/dev/null) || { echo 0; return; }
  # fields 14+15 = utime, stime; field 2 (comm) may contain spaces, so cut
  # everything through the closing paren first.
  echo "${stat##*) }" | awk '{print $12 + $13}'
}

# Launch immediately if no trainer is attached to LOG (observed round 4:
# the watchdog alone was started and the first launch waited out a full
# stall window). log_writers is the ground truth — the archiver only greps
# LOG periodically and never holds it open.
if [ -z "$(log_writers)" ]; then
  echo "[watchdog] no trainer attached to $LOG — launching"
  restart "$@"
fi

last=$(count_progress); lastcpu=$(cpu_time); lastchange=$(date +%s)
baseline=$last
while true; do
  sleep 60
  cur=$(count_progress); curcpu=$(cpu_time); now=$(date +%s)
  # >1 s of CPU accrued this 60 s interval = actively compiling, not wedged.
  # CPU accrual only counts as progress while the CURRENT launch has not yet
  # produced a kv dump (cur == baseline): a wedged device call can leave a
  # spinning thread at ~40% CPU with the step counter frozen (observed
  # round 5, 20+ min at step 7459), which would otherwise mask the stall
  # forever. After the first dump, only dump progress resets the timer.
  busy=0; [ "$curcpu" -gt "$lastcpu" ] && [ $((curcpu - lastcpu)) -ge 100 ] && busy=1
  [ "$cur" -gt "$baseline" ] && busy=0
  lastcpu=$curcpu
  if [ "$cur" != "$last" ] || [ "$busy" = 1 ]; then
    last=$cur; lastchange=$now; continue
  fi
  if [ $((now - lastchange)) -ge "$STALL" ]; then
    echo "[watchdog] no progress for $((now - lastchange))s — restarting"
    restart "$@"
    lastchange=$(date +%s)
    # new logdir appears after restart; reset the baseline
    sleep 120; last=$(count_progress); lastcpu=$(cpu_time)
    baseline=$last
  fi
done
