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
        echo "[watchdog] log quiet ${age}s > ${STALL}s; killing group $pid" >> "$LOG"
        kill -- -"$pid" 2>/dev/null; sleep 5; kill -9 -- -"$pid" 2>/dev/null
        break
      fi
    fi
  done
  wait "$pid" 2>/dev/null
  status=$?
  if kill -0 "$pid" 2>/dev/null; then status=1; fi
  # belt-and-braces: no survivors from the old group before relaunching
  kill -9 -- -"$pid" 2>/dev/null
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
