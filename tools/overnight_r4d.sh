#!/bin/bash
# Round-4 TPU schedule, v5: the machine reboots between driver sessions and
# wipes every untracked file, so the sweep must COMPLETE and be committed
# inside one ~5h window.  v5 therefore runs the RD points at the validated
# fast config's 20k-schedule shapes (--pin_bucket 1024 --sample_budget 65536,
# ~1.3 s/step measured) so all four fit, and drops the final bench phase
# (the round driver runs bench.py itself after the wall).
#   1. adopt + finish the RD depth sweep (4 points, K=4 ctx_grad=0)
#   2. real-dataset E2E (Blender sphere 800^2, CLI driver)
# Usage: overnight_r4d.sh <wall-epoch> [adopted-timeout-pid]
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r4d.sh <wall-epoch> [adopted-pid]}
ADOPTED=${2:-0}
LOG=/tmp/overnight_r4.log
# Staleness threshold: must exceed the longest legitimately-silent phase.
# With a cold jit cache (axon cannot serialize TPU executables, so every
# reboot recompiles) the entropy build + first compiles can be silent for
# 20-40 min; 1200s caused spurious kill-thrash on 2026-08-20.  Training
# logs every 50 steps, so a 40-min silence there is a real relay hang.
source "$(dirname "$0")/watchdog_lib.sh"

watch_pid() {
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

points_done() { wc -l < runs_depth/summary.jsonl 2>/dev/null || echo 0; }

say "v5 start; wall=$(date -d @"$WALL"); adopted=$ADOPTED; points=$(points_done)"

if ! python -c "import cnc_tpu" 2>>"$LOG" || \
   ! python tools/rd_sweep_depth.py --help > /dev/null 2>>"$LOG"; then
  say "PREFLIGHT FAILED; aborting"
  exit 1
fi

# ---- 1. RD depth sweep --------------------------------------------------------
rd_end=$(( WALL - 4200 ))   # reserve sphere 3300s + slack (no bench phase)
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
      --pin_bucket 1024 --sample_budget 65536 \
      --deadline_s 9e8 --out_root runs_depth
  rc=$?
  [ "$rc" -eq 124 ] && break
  [ "$rc" -eq 1 ] && break
done
say "rd sweep phase done; points=$(points_done)"

# ---- 2. real-dataset E2E (800^2 Blender sphere through the CLI driver) --------
# budget generously: the pipeline renders THREE 800^2 eval passes (pre-codec,
# post-codec, post-quant) plus a slow relay upload of the 460 MB ray stack
left=$(( WALL - $(date +%s) ))
if [ "$left" -gt 3600 ]; then
  b=$(( left - 1200 )); [ "$b" -gt 4500 ] && b=4500
  say "sphere E2E: budget ${b}s"
  timeout "$b" python -u train_cnc_nerf_synthetic.py \
    --data_root data_spheres --scene spheres --lmbda 2e-3 \
    --ctx_grad 0 --rate_update_interval 4 --max_steps 300 \
    --max_eval_images 1 --out_root runs_sphere > /tmp/sphere_e2e.log 2>&1
  say "sphere E2E exited rc=$?"
else
  say "sphere E2E SKIPPED (${left}s left)"
fi

say "all done; TPU free"
