#!/usr/bin/env python3
"""Scaling-efficiency benchmark: rays/s at 1..N devices.

Measures the sharded renderer (rays axis) and the view-parallel train-step
path at power-of-two mesh sizes and reports scaling efficiency vs the
single-device rate (BASELINE.json target: ≥80%).  On this machine the mesh
is virtual (CPU host devices) — the harness is the same one a real pod
slice runs; absolute numbers are only meaningful on TPU.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    # Only one real chip exists in this environment: scaling runs on the
    # virtual CPU mesh unless SCALING_TPU=1 explicitly opts into the single
    # TPU (where only n=1 is measurable).  sitecustomize pins the axon
    # platform, so the env var alone is not enough (utils/platform).
    if os.environ.get("SCALING_TPU") != "1":
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu(virtual_devices=8)
    import jax

    import numpy as np

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.ops.film import BORDER
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
    from differentiable_sdf_rendering_tpu.parallel.sharding import make_mesh, render_sharded
    from differentiable_sdf_rendering_tpu.utils.profiling import device_time

    devices = jax.devices()
    res, spp, grid = 64, 8, 32
    scene = Scene.create(
        create_sphere_sdf(grid, radius=0.3), cameras=regular_cameras(2, resx=res, resy=res)
    )
    cfg = RenderConfig(spp=spp)
    n_rays = (res + 2 * BORDER) ** 2 * spp

    results = {}
    n = 1
    while n <= len(devices):
        mesh = make_mesh(n_views_axis=1, devices=devices[:n])
        fn = jax.jit(
            lambda scene: render_sharded(scene, scene.cameras.view(0), 0, cfg, mesh, mode="primal"),
            static_argnums=(),
        )
        dt, _ = device_time(fn, scene, n_runs=3)
        rate = n_rays / dt
        results[n] = {"t": dt, "rays_per_s": rate}
        base = results[1]["rays_per_s"]
        eff = rate / (base * n)
        results[n]["efficiency"] = eff
        print(f"{n} device(s): {dt*1e3:8.1f} ms  {rate/1e6:8.2f} Mrays/s  eff {eff*100:5.1f}%")
        n *= 2

    out = os.environ.get("SCALING_OUT", "output/scaling.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wt") as f:
        json.dump(results, f, indent=2)
    print("→", out)


if __name__ == "__main__":
    main()
