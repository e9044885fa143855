#!/bin/bash
# Round-5 tail: the second full-schedule RD point (lambda=7e-4, 20k steps,
# from scratch) so the flagship RD pair exists at REFERENCE depth.
#
# Rationale: the 10k-depth pair (runs_depth10k/summary.jsonl) is monotone
# in lambda but only 2.4% apart because the 7e-4 point stopped at step
# 8500 - before the first LR milestone (9000) ever fired - so its
# annealing never started (root-caused in RESULTS.md).  The 2e-3 point at
# the full 20k schedule dropped 1.42 -> 0.59 MB coded; this run gives
# 7e-4 the same schedule.  Config matches runs_20k exactly (pin_bucket
# 1024 / sample_budget 65536 / v_ctx_cap 2^20 / K=4 / ctx_grad=0) so the
# two summary rows are apples-to-apples.
#
# Cost, measured (runs_20k): 1.27 s/step -> 20k = 7.05 h + ~25 min fixed
# compile + ~8 min codec/eval tail = ~7.7 h.  Launched ~00:15 UTC with
# wall 10:30 UTC: finishes ~08:00 with >2 h of margin before the
# driver's bench window.
#
# Usage: overnight_r5c.sh <wall-epoch>
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r5c.sh <wall-epoch>}
LOG=/tmp/overnight_r5c.log
source "$(dirname "$0")/watchdog_lib.sh"

say "r5c start; wall=$(date -d @"$WALL")"

if ! python -c "import cnc_tpu" 2>>"$LOG" || \
   ! python tools/rd_sweep_depth.py --help > /dev/null 2>>"$LOG"; then
  say "PREFLIGHT FAILED; aborting"
  exit 1
fi

# ---- lambda=7e-4 full 20k schedule (checkpointed every 500 steps) ----------
run_end=$(( WALL - 300 ))
run_watched "$run_end" /tmp/run7e4_20k.log 8 \
  python -u tools/rd_sweep_depth.py \
    --points 7e-4@4 --ctx_grad 0 --max_steps 20000 \
    --pin_bucket 1024 --sample_budget 65536 --v_ctx_cap 1048576 \
    --deadline_s 9e8 --out_root runs_depth20k
say "7e-4@20k phase done rc=$?: summary=$(cat runs_depth20k/summary.jsonl 2>/dev/null | wc -l) ckpt=$(ls runs_depth20k/ckpt_* 2>/dev/null)"
say "all done; TPU free"
