#!/bin/bash
# Round-4 follow-on: hardware validation of ROOFLINE lever #2 (v_ctx_cap
# 2^21 -> 2^20) at a full RD point.  Runs the SAME point as the round-4
# sweep's lambda=2e-3 row (2,000 steps, K=4, ctx_grad=0, pin_bucket 1024,
# sample_budget 65536) with the smaller cap, so the two rows differ in
# exactly one knob.  Acceptance: PSNR/size on-curve vs runs_depth's
# l0.002_k4 row (|dPSNR| small vs the ~0.9 dB point-to-point spread,
# size within ~1%), s/step measurably lower.  This is the config round 5's
# 20k run uses (tools/overnight_r5.sh), so it de-risks that schedule.
#
# Usage: capval_r4.sh <wall-epoch> [wait-pid]
#   wait-pid: a process (the round-4 orchestrator) to wait for before
#   touching the TPU — a second axon client blocks behind the lease.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: capval_r4.sh <wall-epoch> [wait-pid]}
WAIT=${2:-0}
LOG=/tmp/capval_r4.log
source "$(dirname "$0")/watchdog_lib.sh"

say "start; wall=$(date -d @"$WALL"); waiting on pid $WAIT"
while [ "$WAIT" != 0 ] && kill -0 "$WAIT" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$WALL" ]; then say "wall hit while waiting"; exit 0; fi
  sleep 60
done
say "TPU free; launching cap-validation point"

n=0
while [ "$n" -le 4 ]; do
  left=$(( WALL - $(date +%s) ))
  [ "$left" -lt 600 ] && { say "<600s left, stopping"; break; }
  [ -s runs_capval/summary.jsonl ] && { say "point complete"; break; }
  say "watched start (attempt $((n+1)), ${left}s)"
  touch /tmp/capval_run.log
  timeout "$left" python -u tools/rd_sweep_depth.py \
      --points 2e-3@4 --ctx_grad 0 --max_steps 2000 \
      --pin_bucket 1024 --sample_budget 65536 --v_ctx_cap 1048576 \
      --deadline_s 9e8 --out_root runs_capval >> /tmp/capval_run.log 2>&1 &
  tpid=$!
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y /tmp/capval_run.log) ))
    if [ "$age" -gt "$STALE_S" ]; then
      say "watchdog: stale ${age}s -> kill + restart"
      kill_tree "$tpid"
      break
    fi
  done
  wait "$tpid" 2>/dev/null; rc=$?
  say "watched exit rc=$rc"
  [ "$rc" -eq 0 ] && break
  [ "$rc" -eq 124 ] && break
  n=$((n+1)); sleep 20
done
say "done; summary=$(cat runs_capval/summary.jsonl 2>/dev/null | wc -l) rows"
