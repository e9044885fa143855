#!/bin/bash
# Round-5 tail #2: RD-validate the two remaining ROOFLINE 2.1 rate2d
# levers at the capval depth (lambda=2e-3, 2000 steps, same config as
# runs_capval so that row is the A/B anchor: PSNR 35.2999, coded 1.5524
# MB, 1.25 s/step).
#
#   point 1 (runs_pncap/):   pn_frac_sample_cap 2^21 -> 2^19 (cuts the
#                            dimension-wise-prior histogram ~4x; 73% of
#                            rate2d).
#   point 2 (runs_lever2d/): + v_ctx_cap_2d = 2^17 (fill-sized plane
#                            window compaction; drops rows beyond the
#                            budget - the risky lever).
#
# Adoption rule (manual, after rows land): a lever is validated if its
# point is bit-lossless (delta_codec 0) AND PSNR within the documented
# +-0.3 dB noise band of the anchor AND coded MB within ~3%.  Only then
# flip bench.py's fast config / defaults.
#
# Waits for overnight_r5c (the 7e-4@20k run) to free the chip first.
#
# Usage: overnight_r5d.sh <wall-epoch>
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r5d.sh <wall-epoch>}
LOG=/tmp/overnight_r5d.log
source "$(dirname "$0")/watchdog_lib.sh"

say "r5d start; wall=$(date -d @"$WALL"); waiting for r5c"
while ! grep -q "all done; TPU free" /tmp/overnight_r5c.log 2>/dev/null; do
  sleep 60
  [ "$(date +%s)" -ge $(( WALL - 3600 )) ] && { say "r5c still busy <1h to wall; aborting"; exit 1; }
done
say "r5c done; chip free"

run_end=$(( WALL - 300 ))

say "point 1: pn_frac_cap 2^19"
run_watched "$run_end" /tmp/run_pncap.log 4 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4 --ctx_grad 0 --max_steps 2000 \
    --pin_bucket 1024 --sample_budget 65536 --v_ctx_cap 1048576 \
    --pn_frac_cap 524288 \
    --deadline_s 9e8 --out_root runs_pncap
say "point 1 rc=$?"

say "point 2: pn_frac_cap 2^19 + v_ctx_cap_2d 2^17"
run_watched "$run_end" /tmp/run_lever2d.log 4 \
  python -u tools/rd_sweep_depth.py \
    --points 2e-3@4 --ctx_grad 0 --max_steps 2000 \
    --pin_bucket 1024 --sample_budget 65536 --v_ctx_cap 1048576 \
    --pn_frac_cap 524288 --v_ctx_cap_2d 131072 \
    --deadline_s 9e8 --out_root runs_lever2d
say "point 2 rc=$?"
say "all done; TPU free"
