#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Mirrors the reference's Figure-9a protocol
(``/root/reference/figures/benchmark/benchmark.py:23-118``): 256×256 pixels,
256 primal spp + 64 adjoint spp against a 128³ SDF, mean of N runs, device
timing via ``block_until_ready``.  Headline metric: rays/s/chip through the
forward+backward sphere trace (primal render + VJP of the reparameterized
gradient render), plus redistancing throughput (Fig. 9b).

Runs on whatever the default JAX platform is (the real TPU chip under the
driver; set JAX_PLATFORMS=cpu and BENCH_SMALL=1 for a local smoke run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    scale = os.environ.get("BENCH_SCALE", "full")
    if os.environ.get("BENCH_SMALL", "0") == "1":
        scale = "small"
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import (
        RenderConfig, render_chunked,
    )
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.redistance import redistance

    # film res / primal spp / adjoint spp / grid res / runs / chunks
    # (full = the reference's Fig-9a protocol: 256², 256+64 spp, 128³ SDF)
    params = {
        "small": (64, 16, 8, 32, 2, 1),
        "medium": (128, 64, 16, 64, 3, 16),
        "full": (256, 256, 64, 128, 5, 128),
    }[scale]
    res, primal_spp, adjoint_spp, grid_res, n_runs, n_chunks = params

    sdf_data = target_sdf("bunny", grid_res)
    cams = regular_cameras(1, resx=res, resy=res)
    scene = Scene.create(sdf_data, cameras=cams)
    cfg_p = RenderConfig(integrator="sdf_direct_reparam", spp=primal_spp)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=adjoint_spp)

    @jax.jit
    def primal(scene):
        return render_chunked(scene, 0, seed=0, cfg=cfg_p, mode="primal", n_chunks=n_chunks)

    @jax.jit
    def adjoint(scene, dimg):
        def rf(data):
            return render_chunked(
                scene.replace(sdf=scene.sdf.replace(data=data)),
                0, seed=1, cfg=cfg_g, mode="grad",
                n_chunks=max(1, n_chunks // 4),
            )[..., :3]

        _, vjp = jax.vjp(rf, scene.sdf.data)
        (g,) = vjp(dimg)
        return g

    dimg = jnp.ones((res, res, 3), jnp.float32)

    def sync(x):
        # On the remote-TPU (axon) platform block_until_ready can return
        # before execution finishes; fetching a scalar forces completion.
        return float(jnp.sum(x))

    # warmup/compile
    sync(primal(scene))
    sync(adjoint(scene, dimg))

    t_primal, t_adj = [], []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        sync(primal(scene))
        t_primal.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(adjoint(scene, dimg))
        t_adj.append(time.perf_counter() - t0)

    b = 2  # film border
    primal_rays = (res + 2 * b) ** 2 * primal_spp
    adjoint_rays = (res + 2 * b) ** 2 * adjoint_spp
    tp = float(np.mean(t_primal))
    ta = float(np.mean(t_adj))
    rays_per_s = (primal_rays + adjoint_rays) / (tp + ta)

    # Fig 9b: redistancing throughput at the optimization resolution
    rphi = jax.jit(lambda x: redistance(x))
    x = sdf_data * 3.0
    sync(rphi(x))
    t0 = time.perf_counter()
    sync(rphi(x))
    t_redist = time.perf_counter() - t0

    result = {
        "metric": "rays/s/chip fwd+bwd sphere trace (Fig9a protocol)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": 1.0,
        "detail": {
            "film": res,
            "grid": grid_res,
            "primal_spp": primal_spp,
            "adjoint_spp": adjoint_spp,
            "t_primal_s": round(tp, 4),
            "t_adjoint_s": round(ta, 4),
            "t_redistance_s": round(t_redist, 4),
            "platform": jax.devices()[0].platform,
            "n_runs": n_runs,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
