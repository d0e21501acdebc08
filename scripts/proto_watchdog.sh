#!/bin/bash
# Stall-tolerant driver for run_512_protocol.py on a flaky worker.
# An attempt is killed only when it makes NO PROGRESS (attempt log silent
# for WD_STALL seconds) — wall-clock-slow but advancing attempts survive.
# Each retry resumes from the newest readable checkpoint.
# Default stall limit must exceed the attempt log's print cadence: loss
# prints come every 8 iterations, so at hq's ~96 s/iter that is ~770 s of
# legitimate silence (r5: WD_STALL=600 killed a healthy hq attempt).
STALL=${WD_STALL:-1200}
TRIES=${WD_TRIES:-12}
LOG=${WD_LOG:-output/device_r4/proto512.log}
SUMMARY_DIR=${WD_DIR:-output/device_r4/dragon-no-tex-12-512/warp}
for i in $(seq 1 "$TRIES"); do
  if [ -f "$SUMMARY_DIR/protocol_summary.json" ]; then
    echo "[watchdog] summary exists - done" | tee -a "$LOG"; exit 0
  fi
  ALOG=$(mktemp /tmp/proto_attempt.XXXXXX.log)
  echo "[watchdog] attempt $i (stall limit ${STALL}s) -> $ALOG" | tee -a "$LOG"
  python scripts/run_512_protocol.py >> "$ALOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$ALOG")
    if [ $((now - mt)) -gt "$STALL" ]; then
      echo "[watchdog] attempt $i stalled ($((now - mt))s silent) - killing $PID" | tee -a "$LOG"
      kill "$PID" 2>/dev/null
      sleep 5
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null; rc=$?
  cat "$ALOG" >> "$LOG"
  echo "[watchdog] attempt $i ended rc=$rc" | tee -a "$LOG"
  [ $rc -eq 0 ] && [ -f "$SUMMARY_DIR/protocol_summary.json" ] && exit 0
  sleep 45
done
echo "[watchdog] attempts exhausted" | tee -a "$LOG"
exit 1
