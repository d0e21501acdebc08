#!/usr/bin/env bash
# One ordered measurement pass on the (fragile) remote TPU.
#
# Runs cheapest-first so a mid-session worker crash still leaves the
# earlier numbers on disk; each step has its own hard timeout.  The
# full-protocol bench attempt is LAST and opt-in (DEVICE_FULL=1) because
# it has previously crashed the worker (CLAUDE.md).
#
# Usage:  bash scripts/device_session.sh [outdir]      # on the TPU host
set -u
OUT=${1:-output/device_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  echo "=== $name rc=$rc ==="
}

step probe        480 python -c "
import time, jax, jax.numpy as jnp
t0=time.perf_counter(); print('devices', jax.devices())
t0=time.perf_counter(); float(jnp.sum(jnp.ones((8,8)))); print('rtt_ms', round((time.perf_counter()-t0)*1e3,1))"
grep -q rtt_ms "$OUT/probe.log" || { echo "DEVICE DEAD — aborting session"; exit 1; }

step trace_vars   2400 env BENCH_TRACE=1 python bench.py
step bench_med    2400 env BENCH_CHILD=1 BENCH_SCALE=medium python bench.py
step decomp       1500 python scripts/profile_decomp.py
step gather_full  1500 python scripts/gather_probe.py

if [ "${DEVICE_FULL:-0}" = "1" ]; then
  # Cautious full-Fig9a attempt: 1 run, 1-spp slices (67.6k lanes — the
  # same width class as the medium slices that run fine; the 270k-lane
  # slices of the r1 attempt are what killed the worker).
  step bench_full 3600 env BENCH_CHILD=1 BENCH_SCALE=full BENCH_RUNS=1 BENCH_SLICE=1 python bench.py
fi
echo "session done -> $OUT"
