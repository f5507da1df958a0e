#!/bin/bash
# Stall-watchdog wrapper for long TPU jobs on the tunneled runtime: the
# tunnel occasionally drops a dispatch mid-run (the process sleeps on a futex
# forever, ~0% CPU, log goes quiet). All trainers here are resumable from
# their snapshot dirs, so the safe recovery is kill + relaunch.
#
# Usage: scripts_run_with_watchdog.sh LOGFILE STALL_SECS MAX_RESTARTS -- cmd...
# The command is restarted when LOGFILE stops growing for STALL_SECS while
# the process is still alive. Exits with the command's status once it
# finishes on its own.
#
# The command runs as its own process GROUP (setsid) and the stall kill
# targets the group: killing only the wrapper bash orphans the python
# trainer underneath it, and the relaunch then races the orphan on the same
# checkpoint dir (observed round 4: two trainers interleaved on
# checkpoints_v9 after a stall kill).
set -u
LOG=$1; STALL=$2; MAX_RESTARTS=$3; shift 3
[ "$1" = "--" ] && shift

# Kill PID 1's whole descendant tree by exact PIDs (children first is not
# needed — we gather the full list, then signal every PID and the group).
# Group-kill alone is NOT enough: GNU `timeout` puts its child in a NEW
# process group by default, so `kill -- -pgid` missed `timeout python ...`
# subtrees and orphaned live trainers/preprocessors (observed twice:
# checkpoints_v9 round 4, lowres extension round 4).
kill_tree() {  # kill_tree ROOT_PID SIGNAL
  local pids="$1" frontier="$1" next csv
  while :; do
    # shellcheck disable=SC2086
    csv=$(set -- $frontier; IFS=,; echo "$*")  # no stray commas: ps rejects them
    next=$(ps -o pid= --ppid "$csv" 2>/dev/null | tr -s ' \n' ' ')
    [ -n "${next// /}" ] || break
    pids="$pids $next"; frontier="$next"
  done
  kill "-$2" -- -"$1" 2>/dev/null  # the setsid group
  # shellcheck disable=SC2086
  kill "-$2" $pids 2>/dev/null     # plus every descendant by exact PID
}

restarts=0
while :; do
  setsid "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "[watchdog] launched pgid $pid (restart $restarts)" >> "$LOG"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    if [ -f "$LOG" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$age" -gt "$STALL" ]; then
        echo "[watchdog] log quiet ${age}s > ${STALL}s; killing tree $pid" >> "$LOG"
        kill_tree "$pid" TERM; sleep 5; kill_tree "$pid" KILL
        break
      fi
    fi
  done
  wait "$pid" 2>/dev/null
  status=$?
  if kill -0 "$pid" 2>/dev/null; then status=1; fi
  # belt-and-braces: no survivors from the old tree before relaunching
  kill_tree "$pid" KILL
  # natural exit (0 = done; nonzero without a stall kill = real failure)
  if [ "$status" -eq 0 ]; then
    echo "[watchdog] command finished ok" >> "$LOG"; exit 0
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -gt "$MAX_RESTARTS" ]; then
    echo "[watchdog] giving up after $restarts restarts" >> "$LOG"; exit 1
  fi
  echo "[watchdog] relaunching (status $status)" >> "$LOG"
done
