#!/bin/bash
# Round-4 sphere E2E re-run (attempt 2).  The first attempt trained all 300
# steps but died to a flat 4500s timeout >50 min into a SILENT pre-codec
# 800^2 eval — with no output, a hung relay and a slow eval look identical.
# The eval path now emits a per-8-chunk heartbeat with a forced device sync
# (cnc_tpu/render/renderer.py render_image progress_fn), so this attempt
# runs under the standard log-staleness watchdog with restart + training
# checkpoints, and a budget sized by the wall instead of a guess.
#
# Usage: sphere_rerun_r4.sh <wall-epoch> [wait-pid]
#   wait-pid: process holding the TPU (capval_r4.sh) to wait out first.
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: sphere_rerun_r4.sh <wall-epoch> [wait-pid]}
WAIT=${2:-0}
LOG=/tmp/sphere_rerun.log
RUNLOG=/tmp/sphere_e2e2.log
source "$(dirname "$0")/watchdog_lib.sh"

done_rows() { cat runs_sphere/results/*/output.txt 2>/dev/null | wc -l; }

say "start; wall=$(date -d @"$WALL"); waiting on pid $WAIT"
while [ "$WAIT" != 0 ] && kill -0 "$WAIT" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$WALL" ]; then say "wall hit while waiting"; exit 0; fi
  sleep 60
done
say "TPU free; launching sphere E2E"

n=0
while [ "$n" -le 4 ]; do
  left=$(( WALL - $(date +%s) ))
  [ "$left" -lt 900 ] && { say "<900s left, stopping"; break; }
  [ "$(done_rows)" -ge 1 ] && { say "result row present; done"; break; }
  say "watched start (attempt $((n+1)), ${left}s)"
  touch "$RUNLOG"
  timeout "$left" python -u train_cnc_nerf_synthetic.py \
      --data_root data_spheres --scene spheres --lmbda 2e-3 \
      --ctx_grad 0 --rate_update_interval 4 --max_steps 300 \
      --max_eval_images 1 --out_root runs_sphere \
      --checkpoint_path runs_sphere/ckpt_spheres.npz --checkpoint_every 100 \
      >> "$RUNLOG" 2>&1 &
  tpid=$!
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$RUNLOG") ))
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
say "done; rows=$(done_rows)"
