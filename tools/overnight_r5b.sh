#!/bin/bash
# Round-5 TPU phases after the 20k reference-schedule run (overnight_r5.sh):
#   A   (only if the 20k summary row is missing) rerun the 20k sweep command —
#       it resumes from runs_20k/ckpt_* (a kill mid-pipeline loses no steps)
#   B2  eval per-round-budget profile -> /tmp/eval_spi_choice (feeds C)
#   C   Tanks&Temples 1080p E2E through the real NSVF loader (VERDICT next
#       #5); 800 steps so the occupancy EMA has decayed the warmup-dense
#       grid before the three 2M-ray evals
#   DE  lambda=7e-4 @ 10k-step full-pipeline RD point AND lambda=2e-3 @ 10k
#       (VERDICT next #3) as ONE rd_sweep_depth chain sharing tables and
#       compiled programs; the 2e-3 point is pre-seeded with the
#       mid-schedule snapshot runs_20k/ckpt_10k_l0.002_k4.npz so it resumes
#       at step 10000 and only pays the codec pipeline
#   B   rate2d stage profile (VERDICT next #4 attribution), if time remains
#
# Usage: overnight_r5b.sh <wall-epoch>   # absolute end of TPU work
set -u
cd /root/repo
export PYTHONPATH="/root/.axon_site:/root/repo"
WALL=${1:?usage: overnight_r5b.sh <wall-epoch>}
LOG=/tmp/overnight_r5b.log
source "$(dirname "$0")/watchdog_lib.sh"

say "r5b start; wall=$(date -d @"$WALL")"

# ---- wait for the 20k orchestrator to release the chip
if [ -f /tmp/orch5.pid ]; then
  while kill -0 "$(cat /tmp/orch5.pid)" 2>/dev/null; do sleep 60; done
fi
say "20k orchestrator gone; chip free"

CMD20K=(python -u tools/rd_sweep_depth.py --points 2e-3@4 --ctx_grad 0
        --max_steps 20000 --pin_bucket 1024 --sample_budget 65536
        --v_ctx_cap 1048576 --deadline_s 9e8 --out_root runs_20k)

# ---- phase A: finish the 20k point if its summary row is missing
if [ ! -s runs_20k/summary.jsonl ]; then
  say "phase A: 20k summary missing -> rerun (resumes from checkpoint)"
  run_watched "$WALL" /tmp/run20k.log 4 "${CMD20K[@]}"
  say "phase A rc=$?"
else
  say "phase A: 20k summary present, skipping"
fi

# ---- phase B2: eval per-round budget profile (writes /tmp/eval_spi_choice)
end_b2=$(( $(date +%s) + 2700 )); [ "$end_b2" -gt "$WALL" ] && end_b2=$WALL
say "phase B2: eval spi profile"
run_watched "$end_b2" /tmp/eval_profile.log 1 \
  python -u tools/eval_profile.py
say "phase B2 rc=$? choice=$(cat /tmp/eval_spi_choice 2>/dev/null)"

# ---- phase B: rate2d stage profile + v_ctx_cap_2d pricing (feeds the
# ROOFLINE writeup and the bench fast config BEFORE the round's bench run)
end_b=$(( $(date +%s) + 2400 )); [ "$end_b" -gt "$WALL" ] && end_b=$WALL
say "phase B: rate2d stage profile"
run_watched "$end_b" /tmp/rate2d_stages.log 0 \
  python -u tools/rate2d_stages.py
say "phase B rc=$?"

# ---- phase C: Tanks&Temples 1080p E2E (bounded ~1.9h)
end_c=$(( $(date +%s) + 7000 )); [ "$end_c" -gt "$WALL" ] && end_c=$WALL
EVAL_SPI=$(cat /tmp/eval_spi_choice 2>/dev/null || echo 8)
say "phase C: T&T Spheres E2E (eval_spi=$EVAL_SPI)"
run_watched "$end_c" /tmp/tanks_e2e.log 2 \
  python -u train_cnc_tank_temples.py --data_root data_tanks --scene Spheres \
    --lmbda 2e-3 --max_steps 800 --max_eval_images 1 \
    --sample_num 100000 --n_features 4 --ctx_grad 0 \
    --rate_update_interval 4 --out_root runs_tanks \
    --eval_spi "$EVAL_SPI" \
    --checkpoint_path runs_tanks/ckpt_spheres_tt.npz
say "phase C rc=$?"

# ---- phase DE: 7e-4@10k + 2e-3@10k (snapshot-seeded) in one process
mkdir -p runs_depth10k
if [ -f runs_20k/ckpt_10k_l0.002_k4.npz ] \
   && [ ! -f runs_depth10k/ckpt_l0.002_k4.npz ]; then
  cp runs_20k/ckpt_10k_l0.002_k4.npz runs_depth10k/ckpt_l0.002_k4.npz
fi
now=$(date +%s)
avail=$(( WALL - now - 300 ))
# fixed overhead: tables+compiles (~900 measured in-process) + 2e-3 resume
# point's pipeline (~900, runs FIRST so its row banks early) + 7e-4 tail
# (~400; capval measured 340s eval+encode+decode+quant at these shapes)
steps=$(( (avail - 2600) * 4 / 5 ))     # 1.25 s/step
[ "$steps" -gt 10000 ] && steps=10000
if [ "$steps" -ge 4000 ]; then
  say "phase DE: 2e-3@10k resume + 7e-4@4 for $steps steps (avail ${avail}s)"
  run_watched $(( now + avail )) /tmp/run7e4.log 4 \
    python -u tools/rd_sweep_depth.py --points 2e-3@4,7e-4@4 --ctx_grad 0 \
      --max_steps "$steps" --pin_bucket 1024 --sample_budget 65536 \
      --v_ctx_cap 1048576 --deadline_s 9e8 --out_root runs_depth10k
  say "phase DE rc=$?"
else
  say "phase DE skipped: only ${avail}s left"
fi

say "r5b all done; TPU free"
