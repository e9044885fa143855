#!/bin/bash
# Round-5 TPU schedule: the 20k-step reference-schedule run (VERDICT r3 #3).
#
# Machines reboot between driver sessions and wipe untracked files (jit
# cache included), but the git tree persists across rounds.  Cost model,
# MEASURED on hardware 2026-08-20 (runs_depth + runs_capval, pin_bucket
# 1024 / sample_budget 65536 / K=4 / ctx_grad=0):
#   - default v_ctx_cap 2^21: 1.58 s/step -> 20k = 8.8 h (does NOT fit)
#   - v_ctx_cap 2^20 (ROOFLINE lever #2, RD-validated by the runs_capval
#     point): 1.26 s/step -> 20k = 7.0 h + ~25 min fixed.  Does NOT fit a
#     single 5 h window either — the round-4 tail therefore committed a
#     mid-run checkpoint (runs_20k/ckpt_l0.002_k4.npz, written by
#     tools/head_start_20k.sh); rd_sweep_depth auto-resumes from it, so
#     round 5 only needs the REMAINING ~16k steps ≈ 5.6 h, and its own
#     500-step checkpoints + watchdog let the run span multiple agent
#     sessions inside the round (mid-round reboots keep untracked files;
#     only round transitions wipe them — commit the latest ckpt whenever
#     a session might be the round's last).
# The launcher session should check s/step in /tmp/run20k.log after the
# first ~200 steps and abort early if the remainder will not fit the wall.
# On-track check: the run logs eval-free training metrics every 50 steps;
# compare loss/bits at step 2000 against the round-4 λ=2e-3 anchor (same
# config apart from the cap) before letting it continue.
#
# Usage: overnight_r5.sh <wall-epoch>
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r5.sh <wall-epoch>}
LOG=/tmp/overnight_r5.log
# Cold-compile phases can be silent 20-40 min (the backend cannot
# serialize TPU executables); training logs every 50 steps.
source "$(dirname "$0")/watchdog_lib.sh"

say "r5 start; wall=$(date -d @"$WALL")"

if ! python -c "import cnc_tpu" 2>>"$LOG" || \
   ! python tools/rd_sweep_depth.py --help > /dev/null 2>>"$LOG"; then
  say "PREFLIGHT FAILED; aborting"
  exit 1
fi

# ---- 20k reference-schedule run (checkpointed every 500 steps) --------------
# The LR milestones at 9000-19000 (train_CNC_nerf_synthetic.py:254-294) fire
# for the first time here.  Resumes runs_20k/ckpt_* after a watchdog restart.
run_end=$(( WALL - 300 ))
run_watched "$run_end" /tmp/run20k.log 8 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4 --ctx_grad 0 --max_steps 20000 \
    --pin_bucket 1024 --sample_budget 65536 --v_ctx_cap 1048576 \
    --deadline_s 9e8 --out_root runs_20k
say "20k phase done rc=$?: summary=$(cat runs_20k/summary.jsonl 2>/dev/null | wc -l) ckpt=$(ls runs_20k/ckpt_* 2>/dev/null)"
say "all done; TPU free"
