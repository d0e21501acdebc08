#!/bin/bash
# Stall-tolerant driver for run_512_protocol.py on a flaky worker: each
# attempt gets a hard wall-clock budget; a stalled attempt is killed by
# `timeout` and the next one resumes from the newest readable checkpoint.
# Stops when the protocol summary exists (the run completed) or the
# attempt budget is exhausted.
BUDGET=${WD_BUDGET:-1500}     # seconds per attempt
TRIES=${WD_TRIES:-10}
LOG=${WD_LOG:-output/device_r4/proto512.log}
SUMMARY_DIR=${WD_DIR:-output/device_r4/dragon-no-tex-12-512/warp}
for i in $(seq 1 "$TRIES"); do
  if [ -f "$SUMMARY_DIR/protocol_summary.json" ]; then
    echo "[watchdog] summary exists - done" | tee -a "$LOG"; exit 0
  fi
  echo "[watchdog] attempt $i (budget ${BUDGET}s)" | tee -a "$LOG"
  timeout "$BUDGET" python scripts/run_512_protocol.py >> "$LOG" 2>&1
  rc=$?
  echo "[watchdog] attempt $i exited rc=$rc" | tee -a "$LOG"
  [ $rc -eq 0 ] && exit 0
  sleep 45
done
echo "[watchdog] attempts exhausted" | tee -a "$LOG"
exit 1
