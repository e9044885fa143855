#!/bin/bash
# Relay-hang guard for watched TPU runs (tools/watchdog_lib.sh launches).
#
# The orchestrator watchdog must tolerate 40-min silent cold compiles
# (STALE_S=2400), but during the TRAINING loop the log ticks every ~60 s —
# so a hang there wastes ~35 min before the coarse watchdog fires.  This
# guard applies a tight threshold ONLY when the last log line is a
# training-step line, and recovers by killing the run's python (the
# orchestrator's run_watched then relaunches it, resuming from the point
# checkpoint).  Observed hang signature (2026-08-19/20): log stale, client
# process ~1% CPU sleeping on a futex, chip idle.
#
# Usage: stall_guard.sh <run-log> <orchestrator-pid-file> [threshold-s]
set -u
LOGF=$1
PIDFILE=$2
THRESH=${3:-720}
GLOG=/tmp/stall_guard.log

while true; do
  sleep 60
  [ -f "$PIDFILE" ] || continue
  ORCH=$(cat "$PIDFILE")
  kill -0 "$ORCH" 2>/dev/null || exit 0     # orchestrator done -> guard done
  last=$(tail -n 1 "$LOGF" 2>/dev/null)
  case "$last" in *step=*) ;; *) continue ;; esac
  age=$(( $(date +%s) - $(stat -c %Y "$LOGF" 2>/dev/null || echo 0) ))
  [ "$age" -lt "$THRESH" ] && continue
  # orchestrator -> (timeout|sleep) -> python: kill the grandchildren, but
  # ONLY those whose stdout is THIS log — a later phase's process must
  # never be killed because an earlier phase's log went stale with a
  # step= line at its tail
  ps --ppid "$ORCH" -o pid= | while read -r t; do
    [ -n "$t" ] || continue
    ps --ppid "$t" -o pid= | while read -r p; do
      [ -n "$p" ] || continue
      out=$(readlink "/proc/$p/fd/1" 2>/dev/null)
      [ "$out" = "$LOGF" ] || continue
      echo "[$(date +%H:%M:%S)] $LOGF stale ${age}s -> kill -9 $p" >> "$GLOG"
      kill -9 "$p" 2>/dev/null
    done
  done
  sleep 120      # give run_watched time to notice and relaunch
done
