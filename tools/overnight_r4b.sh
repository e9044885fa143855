#!/bin/bash
# Round-4 overnight TPU schedule, v2 (adopts the already-running RD sweep):
#   1. watch the adopted sweep (staleness watchdog); rerun it under the
#      watchdog until runs_depth/summary.jsonl has all 4 points (done points
#      skip via the summary; an interrupted point resumes from its
#      per-point checkpoint)
#   2. real-dataset E2E: Blender-format sphere at 800^2 through the CLI
#      driver (VERDICT r3 missing #5 — loaders were fixture-tested only)
#   3. 20k-step reference-schedule run, checkpointed, killed at the wall
#   4. one bounded bench.py pass
# Usage: overnight_r4b.sh <wall-epoch> [adopted-timeout-pid]
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r4b.sh <wall-epoch> [adopted-pid]}
ADOPTED=${2:-0}
LOG=/tmp/overnight_r4.log
STALE_S=1200
say() { echo "[orch2 $(date +%H:%M:%S)] $*" >> "$LOG"; }

kill_tree() {
  local w=$1 c
  c=$(ps --ppid "$w" -o pid= 2>/dev/null | tr -d ' ')
  kill "$w" 2>/dev/null
  sleep 10
  kill -0 "$w" 2>/dev/null && kill -9 "$w" 2>/dev/null
  if [ -n "$c" ] && kill -0 "$c" 2>/dev/null; then kill -9 "$c" 2>/dev/null; fi
  sleep 5
}

watch_pid() {  # poll an adopted pid against a log's mtime; kill on staleness
  local pid=$1 logfile=$2 age
  while kill -0 "$pid" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$WALL" ]; then
      say "wall hit; killing adopted $pid"; kill_tree "$pid"; return
    fi
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$logfile") ))
    if [ "$age" -gt "$STALE_S" ]; then
      say "watchdog: adopted $pid stale ${age}s -> kill"
      kill_tree "$pid"
      return
    fi
  done
}

run_watched() {  # run_watched <end_epoch> <logfile> <max_restarts> cmd...
  local end=$1 logfile=$2 tries=$3; shift 3
  local n=0 rc tpid age left
  while [ "$n" -le "$tries" ]; do
    left=$(( end - $(date +%s) ))
    [ "$left" -lt 300 ] && { say "watched: <300s left, stopping"; return 2; }
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
    [ "$rc" -eq 124 ] && return 124
    n=$((n+1)); sleep 20
  done
  return 1
}

points_done() { wc -l < runs_depth/summary.jsonl 2>/dev/null || echo 0; }

say "v2 start; wall=$(date -d @"$WALL"); adopted=$ADOPTED; points=$(points_done)"

if ! python -c "import cnc_tpu" 2>>"$LOG" || \
   ! python tools/rd_sweep_depth.py --help > /dev/null 2>>"$LOG"; then
  say "PREFLIGHT FAILED; aborting"
  exit 1
fi

# ---- 1. RD depth sweep (adopt, then rerun until 4 points or budget gone) ----
rd_end=$(( WALL - 8500 ))   # reserve sphere 55min + 20k >=25min + bench 25min
if [ "$ADOPTED" != 0 ] && kill -0 "$ADOPTED" 2>/dev/null; then
  say "adopting running sweep pid $ADOPTED"
  watch_pid "$ADOPTED" /tmp/sweep_r4b.log
  say "adopted sweep ended; points=$(points_done)"
fi
while [ "$(points_done)" -lt 4 ]; do
  left=$(( rd_end - $(date +%s) ))
  [ "$left" -lt 1200 ] && { say "rd budget exhausted at $(points_done)/4"; break; }
  run_watched "$rd_end" /tmp/sweep_r4b.log 6 \
    python -u tools/rd_sweep_depth.py \
      --points 2e-3@4,7e-4@4,4e-3@4,1e-3@4 --ctx_grad 0 --max_steps 2000 \
      --pin_bucket 4096 --deadline_s 9e8 --out_root runs_depth
  rc=$?
  [ "$rc" -eq 124 ] && break
  [ "$rc" -eq 1 ] && break   # retries exhausted on real errors
done
say "rd sweep phase done; points=$(points_done)"

# ---- 2. real-dataset E2E (800^2 Blender sphere through the CLI driver) ------
left=$(( WALL - $(date +%s) ))
if [ "$left" -gt 5400 ]; then
  say "sphere E2E: budget 3300s"
  timeout 3300 python -u train_cnc_nerf_synthetic.py \
    --data_root data_spheres --scene spheres --lmbda 2e-3 \
    --ctx_grad 0 --rate_update_interval 4 --max_steps 500 \
    --max_eval_images 1 --out_root runs_sphere > /tmp/sphere_e2e.log 2>&1
  say "sphere E2E exited rc=$?"
else
  say "sphere E2E SKIPPED (${left}s left)"
fi

# ---- 3. 20k reference-schedule run (checkpointed; killed at the wall) -------
run_end=$(( WALL - 1500 ))
run_watched "$run_end" /tmp/run20k.log 6 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4 --ctx_grad 0 --max_steps 20000 \
    --pin_bucket 1024 --sample_budget 65536 \
    --deadline_s 9e8 --out_root runs_20k
say "20k phase done: ckpt=$(ls runs_20k/ckpt_* 2>/dev/null)"

# ---- 4. fresh bench record ---------------------------------------------------
left=$(( WALL - $(date +%s) ))
if [ "$left" -gt 600 ]; then
  say "bench pass: budget ${left}s"
  timeout "$left" python -u bench.py > /tmp/bench_r4_final.json 2> /tmp/bench_r4_final.log
  say "bench exited rc=$?"
fi
say "all done; TPU free"
