#!/bin/bash
# Round-4 overnight TPU schedule (single-client chip — strictly sequential):
#   1. RD depth sweep, 4 λ points (VERDICT r3 #2) — watchdog-restarted on
#      log staleness (the axon relay was observed to hang with an idle
#      client socket; per-point checkpoints bound the loss to ≤500 steps)
#   2. 20k-step reference-schedule run (VERDICT r3 #3), checkpointed, killed
#      at the hard wall so the chip is free for the round-end bench
#   3. one bounded bench.py pass for a fresh BENCH record
# Usage: overnight_r4.sh <epoch-when-tpu-must-be-free>
set -u
cd /root/repo
# `python tools/x.py` puts tools/ (not the repo) on sys.path; the axon site
# dir must stay first (verify skill: extend, never replace)
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r4.sh <epoch-when-tpu-must-be-free>}
LOG=/tmp/overnight_r4.log
STALE_S=1200          # longest legitimate quiet gap is the ~510s table build
say() { echo "[orch $(date +%H:%M:%S)] $*" >> "$LOG"; }

kill_tree() {  # TERM the timeout wrapper (forwards to child), then KILL both
  local w=$1 c
  c=$(ps --ppid "$w" -o pid= 2>/dev/null | tr -d ' ')
  kill "$w" 2>/dev/null
  sleep 10
  kill -0 "$w" 2>/dev/null && kill -9 "$w" 2>/dev/null
  if [ -n "$c" ] && kill -0 "$c" 2>/dev/null; then kill -9 "$c" 2>/dev/null; fi
  sleep 5
}

run_watched() {  # run_watched <end_epoch> <logfile> <max_restarts> cmd...
  local end=$1 logfile=$2 tries=$3; shift 3
  local n=0 rc tpid age left
  while [ "$n" -le "$tries" ]; do
    left=$(( end - $(date +%s) ))
    [ "$left" -lt 300 ] && { say "watched: <300s left, not (re)starting"; return 2; }
    say "watched start (attempt $((n+1)), ${left}s): $* >> $logfile"
    touch "$logfile"
    timeout "$left" "$@" >> "$logfile" 2>&1 &
    tpid=$!
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$logfile") ))
      if [ "$age" -gt "$STALE_S" ]; then
        say "watchdog: $logfile stale ${age}s -> kill + restart"
        kill_tree "$tpid"
        break
      fi
    done
    wait "$tpid" 2>/dev/null; rc=$?
    say "watched exit rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    [ "$rc" -eq 124 ] && return 124   # wall kill: no point restarting
    n=$((n+1)); sleep 20
  done
  return 1
}

say "start; wall=$(date -d @"$WALL")"

# preflight: a systematic failure must abort loudly, not burn the retries
if ! python -c "import cnc_tpu" 2>>"$LOG" || \
   ! python tools/rd_sweep_depth.py --help > /dev/null 2>>"$LOG"; then
  say "PREFLIGHT FAILED: cnc_tpu/tools import broken; aborting"
  exit 1
fi

# ---- 1. RD depth sweep: complete the 4-point table ---------------------------
# reserve 70 min for the 20k run + 25 min for bench
rd_end=$(( WALL - 5700 ))
run_watched "$rd_end" /tmp/sweep_r4b.log 6 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4,7e-4@4,4e-3@4,1e-3@4 --ctx_grad 0 --max_steps 2000 \
    --pin_bucket 4096 --deadline_s 9e8 --out_root runs_depth
say "rd sweep phase done; points: $(wc -l < runs_depth/summary.jsonl 2>/dev/null)"

# ---- 2. 20k reference-schedule run (checkpointed; killed at the wall) --------
run_end=$(( WALL - 1500 ))   # keep 25 min for the bench pass
run_watched "$run_end" /tmp/run20k.log 6 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4 --ctx_grad 0 --max_steps 20000 \
    --pin_bucket 1024 --sample_budget 65536 \
    --deadline_s 9e8 --out_root runs_20k
say "20k phase done (124 = wall kill; checkpoint survives): ckpt=$(ls runs_20k/ckpt_* 2>/dev/null)"

# ---- 3. fresh bench record ----------------------------------------------------
left=$(( WALL - $(date +%s) ))
if [ "$left" -gt 600 ]; then
  say "bench pass: budget ${left}s"
  timeout "$left" python -u bench.py > /tmp/bench_r4_final.json 2> /tmp/bench_r4_final.log
  say "bench exited rc=$?"
fi
say "all done; TPU free"
