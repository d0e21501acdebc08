#!/usr/bin/env python3
"""Reconstruct the FULL 512-iteration loss curve of the r4 device run from
its watchdog log (VERDICT r4 #4: the committed metadata.json/loss.png cover
only the last resume segment; the complete curve survives as the every-8th-
iteration prints in proto512.log — 77 samples across all resume attempts;
later attempts re-print iterations they re-ran, so keep the LAST print per
iteration).  Writes loss_full.png/json next to the run's metadata.

New runs don't need this: optimize_shape now stitches loss_values and wall
time across resume segments directly (shape_opt.py, r5).
"""

import json
import os
import re
import sys

log = sys.argv[1] if len(sys.argv) > 1 else "output/device_r4/proto512.log"
out_dir = (
    sys.argv[2]
    if len(sys.argv) > 2
    else "output/device_r4/dragon-no-tex-12-512/warp"
)

by_iter = {}
pat = re.compile(r"\[\s*(\d+)\] loss = ([0-9.eE+-]+)\s+res=\((\d+)")
for line in open(log):
    m = pat.search(line)
    if m:
        by_iter[int(m.group(1))] = (float(m.group(2)), int(m.group(3)))

its = sorted(by_iter)
losses = [by_iter[i][0] for i in its]
with open(os.path.join(out_dir, "loss_full.json"), "w") as f:
    json.dump({"iterations": its, "loss_values": losses}, f)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

plt.figure(figsize=(7, 4))
plt.semilogy(its, losses, marker=".", lw=1)
for x, lbl in ((64, "16³→32³"), (128, "32³→64³")):
    plt.axvline(x, color="0.7", ls="--", lw=0.8)
    plt.text(x + 3, max(losses) * 0.7, lbl, fontsize=8, color="0.4")
plt.xlabel("Iterations")
plt.ylabel("Objective function value")
plt.title(
    f"dragon no-tex-12, 512 iters on TPU v5e — final {losses[-1]:.4f}"
)
plt.tight_layout()
plt.savefig(os.path.join(out_dir, "loss_full.png"), dpi=130)
print(f"{len(its)} samples, iters {its[0]}..{its[-1]}, "
      f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
