#!/bin/bash
# Tunnel-outage recovery loop: probe the TPU backend every ~4 min; once a
# trivial dispatch completes, run the post-v9 pipeline under the stall
# watchdog. If the pipeline dies without printing its DONE marker (tunnel
# dropped again mid-run), fall back to probing. Every pipeline stage is
# skip-if-artifact-exists, so relaunches only redo the interrupted stage.
set -u
cd /root/repo
PIPE=${1:-scripts_r3_post_v9.sh}
LOG=${2:-/tmp/post_v9.log}
DONE_MARK=${3:-"POST-V9 PIPELINE DONE"}
STALL=${4:-600}

while :; do
  if timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax
jax.devices()
import jax.numpy as jnp
float(jnp.ones((2, 2)).sum())
EOF
  then
    echo "[recovery] TPU reachable at $(date -u +%H:%M:%S); launching $PIPE" >> "$LOG"
    bash scripts_run_with_watchdog.sh "$LOG" "$STALL" 20 -- bash "$PIPE"
    if grep -q "$DONE_MARK" "$LOG"; then
      echo "[recovery] pipeline complete" >> "$LOG"
      exit 0
    fi
    echo "[recovery] pipeline exited without DONE marker; back to probing" >> "$LOG"
  fi
  sleep 230
done
