# Shared watchdog scaffolding for the TPU run orchestrators (ADVICE r4:
# the say/kill_tree/run_watched trio was duplicated across four scripts,
# and kill_tree joined multiple child PIDs into one newline-embedded kill
# argument).  Source this file; the caller must set LOG and may override
# STALE_S (seconds of log silence before a restart; cold compiles on the
# tunneled backend can be silent 20-40 min).
#
# Usage:
#   LOG=/tmp/myrun.log
#   source "$(dirname "$0")/watchdog_lib.sh"
#   run_watched <end-epoch> <logfile> <tries> cmd args...

STALE_S=${STALE_S:-2400}

say() { echo "[orch $(date +%H:%M:%S)] $*" >> "$LOG"; }

# Kill a watched process and its whole descendant tree.  `timeout` has one
# python child which itself may fork; iterate the child list line-by-line
# (never `tr`-joined) and TERM the parent first so timeout forwards the
# signal down.
kill_tree() {
  local w=$1 c
  kill "$w" 2>/dev/null
  sleep 10
  kill -0 "$w" 2>/dev/null && kill -9 "$w" 2>/dev/null
  ps --ppid "$w" -o pid= 2>/dev/null | while read -r c; do
    [ -n "$c" ] || continue
    kill -9 "$c" 2>/dev/null
    ps --ppid "$c" -o pid= 2>/dev/null | while read -r g; do
      [ -n "$g" ] && kill -9 "$g" 2>/dev/null
    done
  done
  sleep 5
}

# Run a command under (a) a hard wall deadline and (b) a log-staleness
# watchdog, restarting up to <tries> times.  Returns 0 on success, 124 if
# the wall expired, 2 if <300 s remain, 1 after exhausting retries.
run_watched() {
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
