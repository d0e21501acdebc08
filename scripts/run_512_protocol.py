#!/usr/bin/env python3
"""The reference's actual 512-iteration protocol on device (VERDICT r3 #2).

dragon `no-tex-12` at the reference defaults (configs.py:14 n_iter=512,
shape_opt.py:75-105): through both grid upsamples (iter 64: 16³→32³,
iter 128: 32³→64³) into the 64³ final phase, with per-phase s/iter and the
full loss curve recorded.  Checkpoints land every 64 iterations
(opt_cfg.checkpoint_frequency), so a TPU-worker crash only loses the
current 64-block: rerun this script and it resumes from the newest
checkpoint.

Usage:  python scripts/run_512_protocol.py            # run / resume
        PROTO_ITERS=128 python scripts/run_512_protocol.py   # shorter
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def newest_checkpoint(out_dir):
    """Newest READABLE iteration checkpoint (a watchdog-killed attempt can
    leave a truncated .vol behind — skip and delete those)."""
    from differentiable_sdf_rendering_tpu.utils.io import read_vol

    cands = glob.glob(os.path.join(out_dir, "params", "sdf-data-*.vol"))
    its = sorted(int(re.search(r"(\d+)\.vol$", c).group(1)) for c in cands)
    while its:
        it = its.pop()
        path = os.path.join(out_dir, "params", f"sdf-data-{it:04d}.vol")
        try:
            read_vol(path)
            return it
        except Exception as e:
            print(f"[checkpoint] dropping unreadable {path}: {e}", flush=True)
            os.rename(path, path + ".bad")
    return None


def main():
    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape
    from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    n_iter = int(os.environ.get("PROTO_ITERS", "512"))
    scene = os.environ.get("PROTO_SCENE", "dragon")
    cfg_name = os.environ.get("PROTO_OPT", "no-tex-12")
    tag = os.environ.get("PROTO_TAG", "512")
    base = os.environ.get("PROTO_BASE", os.path.join("output", "device_r5"))
    out = os.path.join(base, f"{scene}-{cfg_name}-{tag}", "warp")
    os.makedirs(out, exist_ok=True)

    mc = get_config("warp")
    oc, _ = get_opt_config(cfg_name)
    # bound the work lost to a transient remote-compile failure / worker
    # flake (observed: "response body closed" exactly at the iter-64
    # upsample recompile) — checkpoint every 32 iterations and retry with
    # resume-from-newest
    oc.checkpoint_frequency = int(os.environ.get("PROTO_CKPT", "32"))

    times = []

    def cb(i, params, losses):
        times.append((i, time.perf_counter()))
        if len(times) % 16 == 1:
            print(f"[timing] iter {i} t={times[-1][1]:.1f}", flush=True)

    res = None
    for attempt in range(int(os.environ.get("PROTO_RETRIES", "8"))):
        resume = newest_checkpoint(out)
        if resume is not None:
            print(f"[attempt {attempt}] resume from checkpoint {resume}", flush=True)
        try:
            res = optimize_shape(
                scene, oc, mc, output_dir=out,
                ref_spp=int(os.environ.get("PROTO_REF_SPP", "256")),
                n_iter=n_iter, verbose=True, checkpoint_cb=cb,
                render_chunks=16, resume_from=resume,
            )
            break
        except Exception as e:
            print(f"[attempt {attempt}] failed: {type(e).__name__}: {e}", flush=True)
            time.sleep(60)
    if res is None:
        print("[giving up] all attempts failed", flush=True)
        return 1

    # per-phase s/iter from the callback timestamps
    phases = {}
    for (i0, t0), (i1, t1) in zip(times, times[1:]):
        if i1 != i0 + 1:
            continue
        key = f"{oc.res_at(i1)[0]}px-it{64 * (min(i1, n_iter - 1) // 64)}"
        phases.setdefault(key, []).append(t1 - t0)
    summary = {
        "scene": scene, "config": cfg_name, "n_iter": n_iter,
        "total_time_s": round(res.total_time, 1),
        "final_loss": res.loss_values[-1] if res.loss_values else None,
        "mean_loss_last16": (
            sum(res.loss_values[-16:]) / max(len(res.loss_values[-16:]), 1)
            if res.loss_values else None
        ),
        "phase_s_per_iter": {
            k: round(sum(v) / len(v), 2) for k, v in phases.items() if v
        },
    }
    with open(os.path.join(out, "protocol_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
