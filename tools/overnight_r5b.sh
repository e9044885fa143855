#!/bin/bash
# Round-5 TPU phases after the 20k reference-schedule run (overnight_r5.sh):
#   A  (only if the 20k summary row is missing) rerun the 20k sweep command —
#      it resumes from runs_20k/ckpt_* (a kill mid-pipeline loses no steps)
#   B  rate2d stage profile (VERDICT r4 next #4 attribution)
#   C  Tanks&Temples 1080p E2E through the real NSVF loader (next #5)
#   D  lambda=7e-4 @ 10k-step full-pipeline RD point (next #3, rate
#      separation at depth); step count flexes to the remaining wall
#   E  (opportunistic) lambda=2e-3 @ 10k encode-only point from the
#      mid-schedule snapshot runs_20k/ckpt_10k_l0.002_k4.npz: copied into a
#      fresh out_root, rd_sweep_depth resumes it at step 10000, fit() is a
#      no-op and the full codec pipeline runs
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

# ---- phase B: rate2d stage profile (bounded)
end_b=$(( $(date +%s) + 2400 )); [ "$end_b" -gt "$WALL" ] && end_b=$WALL
say "phase B: rate2d stage profile"
run_watched "$end_b" /tmp/rate2d_stages.log 0 \
  python -u tools/rate2d_stages.py
say "phase B rc=$?"

# ---- phase B2: eval per-round budget profile (writes /tmp/eval_spi_choice)
end_b2=$(( $(date +%s) + 2700 )); [ "$end_b2" -gt "$WALL" ] && end_b2=$WALL
say "phase B2: eval spi profile"
run_watched "$end_b2" /tmp/eval_profile.log 1 \
  python -u tools/eval_profile.py
say "phase B2 rc=$? choice=$(cat /tmp/eval_spi_choice 2>/dev/null)"

# ---- phase C: Tanks&Temples 1080p E2E (bounded ~1.6h)
end_c=$(( $(date +%s) + 6000 )); [ "$end_c" -gt "$WALL" ] && end_c=$WALL
EVAL_SPI=$(cat /tmp/eval_spi_choice 2>/dev/null || echo 8)
say "phase C: T&T Spheres E2E (eval_spi=$EVAL_SPI)"
run_watched "$end_c" /tmp/tanks_e2e.log 2 \
  python -u train_cnc_tank_temples.py --data_root data_tanks --scene Spheres \
    --lmbda 2e-3 --max_steps 300 --max_eval_images 1 \
    --sample_num 100000 --n_features 4 --ctx_grad 0 \
    --rate_update_interval 4 --out_root runs_tanks \
    --eval_spi "$EVAL_SPI" \
    --checkpoint_path runs_tanks/ckpt_spheres_tt.npz
say "phase C rc=$?"

# ---- phase D: lambda=7e-4 RD point at the deepest depth that fits
now=$(date +%s)
resv_e=3900                      # phase-E reservation (dropped if tight)
avail=$(( WALL - now - resv_e ))
steps=$(( (avail - 2700) * 4 / 5 ))     # 1.25 s/step
[ "$steps" -gt 10000 ] && steps=10000
if [ "$steps" -lt 10000 ]; then
  # phase E is strictly opportunistic: the 10k depth of D outranks it
  avail=$(( WALL - now ))
  steps=$(( (avail - 2700) * 4 / 5 ))
  [ "$steps" -gt 10000 ] && steps=10000
  resv_e=0
fi
if [ "$steps" -ge 4000 ]; then
  say "phase D: lambda=7e-4@4 for $steps steps (avail ${avail}s)"
  run_watched $(( now + avail )) /tmp/run7e4.log 4 \
    python -u tools/rd_sweep_depth.py --points 7e-4@4 --ctx_grad 0 \
      --max_steps "$steps" --pin_bucket 1024 --sample_budget 65536 \
      --v_ctx_cap 1048576 --deadline_s 9e8 --out_root runs_depth10k
  say "phase D rc=$?"
else
  say "phase D skipped: only ${avail}s left"
fi

# ---- phase E: lambda=2e-3 @ 10k encode-only from the snapshot
left=$(( WALL - $(date +%s) ))
if [ "$resv_e" -gt 0 ] && [ "$left" -gt 3300 ] \
   && [ -f runs_20k/ckpt_10k_l0.002_k4.npz ]; then
  say "phase E: 2e-3@10k encode-only (${left}s left)"
  mkdir -p runs_20k_at10k
  cp runs_20k/ckpt_10k_l0.002_k4.npz runs_20k_at10k/ckpt_l0.002_k4.npz
  run_watched "$WALL" /tmp/run2e3_10k.log 2 \
    python -u tools/rd_sweep_depth.py --points 2e-3@4 --ctx_grad 0 \
      --max_steps 10000 --pin_bucket 1024 --sample_budget 65536 \
      --v_ctx_cap 1048576 --deadline_s 9e8 --out_root runs_20k_at10k
  say "phase E rc=$?"
else
  say "phase E skipped (left=${left}s resv=${resv_e})"
fi
say "r5b all done; TPU free"
