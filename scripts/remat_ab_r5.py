#!/usr/bin/env python3
"""r5: controlled A/B for the remat-off stall suspicion (VERDICT r4 #3).

Runs alternating blocks of no-tex-12 FINAL-phase iterations (64³ grid,
128² film — the exact regime where the two r4 proto512 stalls happened)
with the residual-storing gradient render (DSDF_GRAD_REMAT=0) and the
rematerializing one (=1), same seeds, in SUBPROCESSES so a worker stall
kills only the block (wall-clock budget per block).  Records s/iter and
stall/completion per block.

Verdict rule: if remat-off completes all its blocks at the faster rate, the
correlation was the degraded tunnel, not remat-off — flip _grad_remat_auto.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOCKS = int(os.environ.get("AB_BLOCKS", "4"))  # alternating 1,0,1,0
ITERS = int(os.environ.get("AB_ITERS", "10"))
BUDGET_S = int(os.environ.get("AB_BUDGET", "1500"))  # per block

results = []
for blk in range(BLOCKS):
    remat = "1" if blk % 2 == 0 else "0"
    env = dict(os.environ)
    env.update({
        "DSDF_GRAD_REMAT": remat,
        "ITERS": str(ITERS),
        "ITER_PHASE": "final",
        "ITER_CHUNKS": "16",
    })
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "tpu_iter_bench.py")],
            env=env, cwd=ROOT, capture_output=True, text=True, timeout=BUDGET_S,
        )
        tail = (p.stdout or "").strip().splitlines()
        last = tail[-1] if tail else ""
        try:
            d = json.loads(last)
        except Exception:
            d = {"raw": last, "stderr": (p.stderr or "")[-500:]}
        rec = {"block": blk, "remat": remat, "ok": p.returncode == 0,
               "wall_s": round(time.time() - t0, 1), "result": d}
    except subprocess.TimeoutExpired:
        rec = {"block": blk, "remat": remat, "ok": False, "stalled": True,
               "wall_s": round(time.time() - t0, 1)}
    results.append(rec)
    print(json.dumps(rec), flush=True)

n_stall = {r: sum(1 for x in results if x["remat"] == r and not x["ok"]) for r in "01"}
print(json.dumps({"summary": {"stalls_remat_on": n_stall["1"],
                              "stalls_remat_off": n_stall["0"]}}), flush=True)
