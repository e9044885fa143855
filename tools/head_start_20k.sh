#!/bin/bash
# Round-4 tail: give the round-5 20k reference-schedule run a HEAD START.
# Waits for the TPU to free (the sphere re-run), then runs overnight_r5.sh
# until the given wall.  The run checkpoints runs_20k/ckpt_*.npz every 500
# steps; committing the latest checkpoint before the round ends lets round
# 5 resume mid-run instead of restarting (machines reboot between rounds
# and wipe untracked files — a committed checkpoint survives).
#
# Usage: head_start_20k.sh <wall-epoch> [wait-pid]
set -u
cd /root/repo
WALL=${1:?usage: head_start_20k.sh <wall-epoch> [wait-pid]}
WAIT=${2:-0}
LOG=/tmp/head_start_20k.log
say() { echo "[hs20k $(date +%H:%M:%S)] $*" >> "$LOG"; }

say "start; wall=$(date -d @"$WALL"); waiting on pid $WAIT"
while [ "$WAIT" != 0 ] && kill -0 "$WAIT" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$WALL" ]; then say "wall hit while waiting"; exit 0; fi
  sleep 60
done
left=$(( WALL - $(date +%s) ))
if [ "$left" -lt 1800 ]; then
  say "only ${left}s left; not worth a cold start"; exit 0
fi
say "TPU free; handing off to overnight_r5.sh (${left}s)"
exec bash tools/overnight_r5.sh "$WALL"
