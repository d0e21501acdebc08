#!/usr/bin/env python3
"""Run the full validation/figure suite (reference ``figures/run_all_figures.py``).

Sequentially runs:
  1. the Fig-9 benchmark harness (per-method render cost + redistancing),
  2. the forward-gradient method comparison (Figs 4/7/8-style, vs FD),
  3. a reconstruction run per scene (loss curves + checkpoints + turntable),
  4. the scaling benchmark on the local device mesh.

Everything lands under --out.  Use --scale small / --cpu for a quick pass.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def run(cmd, env=None):
    print("::", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=ROOT, env=env or os.environ.copy())
    if r.returncode != 0:
        print(f"[warn] step failed ({r.returncode}): {' '.join(cmd)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "full"], default="small")
    ap.add_argument("--out", default="output/validations")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", nargs="+", default=["dragon"])
    args = ap.parse_args()

    py = sys.executable
    cpu = ["--cpu"] if args.cpu else []
    os.makedirs(args.out, exist_ok=True)

    run([py, os.path.join(HERE, "benchmark_methods.py"), "--scale", args.scale,
         "--out", os.path.join(args.out, "benchmark")] + cpu)
    run([py, os.path.join(HERE, "forwardgrads.py"), "--scene", args.scenes[0],
         "--out", os.path.join(args.out, "forwardgrads")] + cpu
        + (["--res", "48", "--grid", "32", "--spp", "8", "--fd-spp", "256"] if args.scale == "small" else []))
    n_iter = "16" if args.scale == "small" else "512"
    opt_cfg = "no-tex-6" if args.scale == "small" else "no-tex-12"
    extra = ["--refspp", "64"] if args.scale == "small" else []
    run([py, os.path.join(ROOT, "optimize.py"), *args.scenes, "--optconfig", opt_cfg,
         "--configs", "warp", "--n_iter", n_iter, "--outputdir",
         os.path.join(args.out, "opt"), "--force"] + extra + cpu)
    env = os.environ.copy()
    env["SCALING_OUT"] = os.path.join(args.out, "scaling.json")
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    run([py, os.path.join(HERE, "scaling_bench.py")], env=env)
    print("[done] →", args.out)


if __name__ == "__main__":
    main()
