#!/usr/bin/env python3
"""r5: the brick/Morton stencil-layout experiment (named "the next lever" in
VERDICT r2-r4, never run).  Times a plain trace and a warp trace at 128³
with the production row-major table vs the 8³-brick-tiled one
(grid.build_stencil_brick), warm-execution protocol (see newton_retest_r5).
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

import jax
import jax.numpy as jnp

enable_compile_cache()

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops import grid as gridops
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF, TraceParams
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

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
    sdf = GridSDF.create(target_sdf("bunny", grid_res)).prepare()
    zres, yres, xres = sdf.data.shape[-3:]
    brick_table, dims = gridops.build_stencil_brick(sdf.stencil, zres, yres, xres)
    sdf_brick = sdf.replace(stencil=brick_table)

    cam = regular_cameras(1, resx=res, resy=res).view(0)
    n = (res + 4) * (res + 4) * k
    lane = jnp.arange(n, dtype=jnp.uint32)
    lane = (lane // k) * jnp.uint32(spp) + (lane % k)
    pwx = res + 4
    pix = lane // spp
    uni = lane_uniforms(0, lane, 6)
    pos = jnp.stack([(pix % pwx).astype(jnp.float32) - 2 + uni[:, 0],
                     (pix // pwx).astype(jnp.float32) - 2 + uni[:, 1]], -1)
    o, d = cam.sample_ray(pos)
    tp = TraceParams(compact_stages=(4, 16, 128))

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:24s} {dt*1e3:9.2f} ms", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n} bricks={dims}", flush=True)

    tr = jax.jit(lambda s, o_, d_: sphere_trace(s, o_, d_, tp))
    trw = jax.jit(lambda s, o_, d_: sphere_trace_warp(s, o_, d_, tp).warp_t)

    rec("rowmajor_plain", timed(tr, sdf, o, d))
    gridops._STENCIL_BRICK = dims
    trb = jax.jit(lambda s, o_, d_: sphere_trace(s, o_, d_, tp))
    rec("brick_plain", timed(trb, sdf_brick, o, d))
    # correctness: identical hit distances
    a = tr(sdf, o, d)
    bt = trb(sdf_brick, o, d)
    import numpy as np

    af, bf = np.asarray(a), np.asarray(bt)
    same = np.isfinite(af) == np.isfinite(bf)
    ok = bool(same.all()) and bool(
        np.allclose(af[np.isfinite(af)], bf[np.isfinite(bf)], atol=1e-5))
    print(f"  brick==rowmajor: {ok}", flush=True)
    trwb = jax.jit(lambda s, o_, d_: sphere_trace_warp(s, o_, d_, tp).warp_t)
    rec("brick_warp", timed(trwb, sdf_brick, o, d))
    gridops._STENCIL_BRICK = None
    rec("rowmajor_warp", timed(trw, sdf, o, d))
    out["equal"] = ok

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
