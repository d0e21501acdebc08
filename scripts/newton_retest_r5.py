#!/usr/bin/env python3
"""r5: clean Newton-vs-fixed refine retest with the cold-executable artifact
controlled (refine_bisect_r5 showed fresh executables read up to ~10-20×
inflated for their first executions on the axon runtime — the r4 bisect that
measured 'newton 444 ms vs fixed 79 ms' used single-warmup timing and is
therefore suspect).  Protocol: 8 warm executions per executable before
timing, both orderings, plain trace AND a full primal render slice.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache, force_cpu

if os.environ.get("JAX_PLATFORMS") == "cpu":
    force_cpu()

import jax
import jax.numpy as jnp

enable_compile_cache()

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_lane_block
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops.film import BORDER
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace

WARM = int(os.environ.get("PROBE_WARM", "8"))
REPS = int(os.environ.get("PROBE_REPS", "8"))


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timed(f, *args):
    for _ in range(WARM):
        r = f(*args)
    sync(r)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(REPS)]
    sync(sum(jnp.ravel(r)[0] for r in outs))
    return (time.perf_counter() - t0) / REPS


def main():
    res, grid_res, k, spp = 256, 128, 4, 256
    sdf_data = target_sdf("bunny", grid_res)
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(sdf_data, cameras=cams)
    scene = scene.replace(sdf=scene.sdf.prepare())
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)
    n = pw * k
    i = jnp.arange(n, dtype=jnp.uint32)
    lane = (i // k) * jnp.uint32(spp) + (i % k)
    pwx = res + 2 * b
    pix = lane // spp
    uni = lane_uniforms(0, lane, 6)
    pos = jnp.stack([(pix % pwx).astype(jnp.float32) - b + uni[:, 0],
                     (pix // pwx).astype(jnp.float32) - b + uni[:, 1]], -1)
    o, d = cam.sample_ray(pos)

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:28s} {dt*1e3:9.2f} ms", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n}", flush=True)

    def trace_fn(refine):
        tp = dataclasses.replace(RenderConfig(integrator="sdf_direct_reparam",
                                              spp=spp).trace, refine=refine)
        return jax.jit(lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp))

    def slice_fn(refine):
        cfg = RenderConfig(integrator="sdf_direct_reparam", spp=spp)
        cfg = dataclasses.replace(cfg, trace=dataclasses.replace(cfg.trace,
                                                                 refine=refine))
        return jax.jit(lambda s, c: render_lane_block(
            s, cam, lane + c * jnp.uint32(k), 0, cfg, "primal", dense_groups=k))

    # order A: fixed first; order is then swapped for the repeat rows
    rec("trace_fixed", timed(trace_fn("fixed"), scene, o, d))
    rec("trace_newton", timed(trace_fn("newton"), scene, o, d))
    rec("trace_newton#2", timed(trace_fn("newton"), scene, o, d))
    rec("trace_fixed#2", timed(trace_fn("fixed"), scene, o, d))

    rec("slice_fixed", timed(slice_fn("fixed"), scene, jnp.uint32(0)))
    rec("slice_newton", timed(slice_fn("newton"), scene, jnp.uint32(0)))
    rec("slice_newton#2", timed(slice_fn("newton"), scene, jnp.uint32(1)))
    rec("slice_fixed#2", timed(slice_fn("fixed"), scene, jnp.uint32(1)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
