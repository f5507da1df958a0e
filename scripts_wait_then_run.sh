#!/bin/bash
# Serialize TPU pipelines: wait until MARKER appears in WAIT_LOG (the
# previous pipeline's DONE line — the chip accepts ONE process at a time),
# then hand the next pipeline to the recovery loop.
# Usage: scripts_wait_then_run.sh WAIT_LOG MARKER PIPE LOG DONE_MARK [STALL]
set -u
cd /root/repo
WAIT_LOG=$1; MARKER=$2; PIPE=$3; LOG=$4; DONE_MARK=$5; STALL=${6:-600}
while ! grep -q "$MARKER" "$WAIT_LOG" 2>/dev/null; do sleep 60; done
sleep 30  # let the previous loop's wrapper processes drain
exec bash scripts_tpu_recovery_loop.sh "$PIPE" "$LOG" "$DONE_MARK" "$STALL"
