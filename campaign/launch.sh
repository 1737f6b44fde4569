#!/bin/bash
# Campaign launcher with claim-wedge retry.
#
# The axon tunnel's chip claim intermittently hangs forever (the client
# blocks in its first device transfer and never retries).  This wrapper
# starts the trainer, watches the log for step lines, and if none appear
# within WAIT_S kills that exact PID, cools down, and relaunches.
# --checkpoint auto makes relaunches resume-safe.
#
# Usage: campaign/launch.sh <logfile> <outdir> [extra run_rnnt args...]
# DATA env var overrides the dataset dir (default campaign/data).
set -u
LOG=$1; shift
OUT=$1; shift
WAIT_S=${WAIT_S:-420}
COOL_S=${COOL_S:-90}
TRIES=${TRIES:-8}
DATA=${DATA:-campaign/data}

cd /root/repo
for attempt in $(seq 1 "$TRIES"); do
  echo "[launch] attempt $attempt $(date +%H:%M:%S)" >> "$LOG.launcher"
  # only watch log content appended by THIS attempt (resume relaunches
  # append to a log that already contains step lines)
  offset=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  PYTHONPATH=/root/repo:/root/.axon_site python -u campaign/train_wrapper.py \
    --mode train --data_dir "$DATA" --output_dir "$OUT" \
    --checkpoint auto "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "$pid" > "$LOG.pid"   # exact-PID handle for external watchdogs
  # wait for the first step line (or process exit)
  ok=0
  for i in $(seq 1 $((WAIT_S / 10))); do
    sleep 10
    if ! kill -0 "$pid" 2>/dev/null; then
      wait "$pid"; rc=$?
      echo "[launch] trainer exited rc=$rc" >> "$LOG.launcher"
      if [ "$rc" -eq 0 ]; then exit 0; fi
      ok=2; break
    fi
    if tail -c "+$((offset + 1))" "$LOG" | grep -q "step "; then ok=1; break; fi
  done
  if [ "$ok" -eq 1 ]; then
    echo "[launch] steps flowing; waiting for completion" >> "$LOG.launcher"
    wait "$pid"; rc=$?
    echo "[launch] trainer finished rc=$rc" >> "$LOG.launcher"
    exit "$rc"
  fi
  if [ "$ok" -eq 0 ]; then
    echo "[launch] no steps after ${WAIT_S}s; killing $pid" >> "$LOG.launcher"
    kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
  fi
  sleep "$COOL_S"
done
echo "[launch] giving up after $TRIES attempts" >> "$LOG.launcher"
exit 1
