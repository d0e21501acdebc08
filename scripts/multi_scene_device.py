#!/usr/bin/env python3
"""r5: first DEVICE measurement of the multi-scene vmapped batch
(BASELINE.json config 4 — 'multi-scene × views batch'; VERDICT r4 #7).

4 procedural shapes × 24 views reconstructed simultaneously by the vmapped
train step (opt/multi_scene.optimize_shapes_batched); reports s/iter and
per-scene final losses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache, force_cpu

if os.environ.get("JAX_PLATFORMS") == "cpu":
    force_cpu()

import dataclasses

import jax

enable_compile_cache()

from differentiable_sdf_rendering_tpu.opt.configs import get_config
from differentiable_sdf_rendering_tpu.opt.multi_scene import optimize_shapes_batched
from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config


def main():
    scenes = os.environ.get("MS_SCENES", "sphere,torus,bunny,cranium").split(",")
    n_iter = int(os.environ.get("MS_ITERS", "24"))
    mc = get_config("warp")
    oc, _ = get_opt_config(os.environ.get("MS_CONFIG", "no-tex-12"))
    oc = dataclasses.replace(
        oc,
        n_sensors=int(os.environ.get("MS_VIEWS", "24")),
        batch_size=int(os.environ.get("MS_BATCH", "4")),
        resx=int(os.environ.get("MS_RES", "48")),
        resy=int(os.environ.get("MS_RES", "48")),
        sdf_res=16,
        upsample_iter=(n_iter // 2,),
        render_upsample_iter=(),
    )
    t0 = time.time()
    out = optimize_shapes_batched(
        scenes, oc, mc, n_iter=n_iter,
        ref_spp=int(os.environ.get("MS_REF_SPP", "64")),
        target_res=48,
    )
    wall = time.time() - t0
    summary = {
        "metric": "multi-scene vmapped batch (device)",
        "scenes": scenes,
        "views": oc.n_sensors,
        "batch": oc.batch_size,
        "film": oc.resx,
        "n_iter": n_iter,
        "total_s": round(wall, 1),
        "s_per_iter": round(wall / n_iter, 2),
        "platform": jax.devices()[0].platform,
        "losses": {
            k: [round(float(v), 5) for v in curve[:: max(1, n_iter // 8)]]
            + [round(float(curve[-1]), 5)]
            for k, (_, curve) in out.items()
        },
    }
    print(json.dumps(summary), flush=True)
    os.makedirs("output/multi_scene", exist_ok=True)
    with open("output/multi_scene/device_r5.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
