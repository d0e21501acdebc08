#!/bin/bash
# hq FINAL-PHASE device run (VERDICT r3 #1): warm-start no-tex-12-hq at its
# iter-220 boundary from the 512-protocol run's 64^3 checkpoint.  At i=220
# the hq schedule itself upsamples 64^3 -> 128^3, resets Adam, and the film
# jumps to 256^2 — the exact final-phase state transition — after which
# every iteration runs through the host-sliced step on device.
set -e
SRC=output/device_r4/dragon-no-tex-12-512/warp/params
DST=${HQ_BASE:-output/device_r5}/dragon-no-tex-12-hq-final/warp/params
mkdir -p "$DST"
if ! ls "$DST"/sdf-data-*.vol >/dev/null 2>&1; then
  LATEST=$(ls "$SRC"/sdf-data-*.vol | sort | tail -1)
  cp "$LATEST" "$DST/sdf-data-0219.vol"
  echo "[hq-final] seeded from $LATEST"
fi
PROTO_OPT=no-tex-12-hq PROTO_TAG=final PROTO_ITERS=${HQ_ITERS:-284} \
PROTO_BASE=${HQ_BASE:-output/device_r5} \
PROTO_REF_SPP=${HQ_REF_SPP:-128} PROTO_SCENE=dragon PROTO_RETRIES=6 PROTO_CKPT=8 \
exec python scripts/run_512_protocol.py
