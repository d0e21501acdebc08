#!/usr/bin/env python3
"""r5: does the PACKED (n/2, 128) table layout also speed the 128³ trace?

At 256³ packed measured 61.8/66.4 ms per 262k lanes vs r3's unpacked 93.6
(1.4×).  If that's a table-footprint/cache effect it should show at 128³
too (575 → 287 MB) — and bench's PRIMAL slices (gradients never flow
through the primal table) could adopt it.
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
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_lane_block
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops import grid as gridops
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.sdf import TraceParams
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

WARM = int(os.environ.get("PROBE_WARM", "6"))
REPS = int(os.environ.get("PROBE_REPS", "8"))


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timed(f, *args):
    for _ in range(WARM):
        r = f(*args)
    sync(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(REPS)]
    sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
    return (time.perf_counter() - t0) / REPS


def main():
    res, grid_res, k, spp = 256, 128, 8, 256
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(target_sdf("bunny", grid_res), cameras=cams)
    scene_u = scene.replace(sdf=scene.sdf.prepare())  # unpacked (n, 64)

    # force the packed incremental path at 128³
    saved_inc, saved_pack = gridops._INCREMENTAL_BUILD_ROWS, gridops._PACK_TABLE_ROWS
    gridops._INCREMENTAL_BUILD_ROWS = 0
    gridops._PACK_TABLE_ROWS = 0
    try:
        packed = gridops.build_stencil_incremental(scene.sdf.data)
    finally:
        gridops._INCREMENTAL_BUILD_ROWS, gridops._PACK_TABLE_ROWS = saved_inc, saved_pack
    scene_p = scene.replace(sdf=scene.sdf.replace(stencil=packed))

    b = 2
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
    tp = TraceParams(compact_stages=(4, 16, 128))
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=spp)

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:26s} {dt*1e3:9.2f} ms", flush=True)

    tr = lambda: jax.jit(lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp))
    trw = lambda: jax.jit(lambda s, o_, d_: sphere_trace_warp(s.sdf, o_, d_, tp).warp_t)
    sl = lambda: jax.jit(lambda s, c: render_lane_block(
        s, cam, lane + c * jnp.uint32(k), 0, cfg, "primal", dense_groups=k))

    rec("_cold", timed(tr(), scene_u, o, d))
    rec("unpacked_plain", timed(tr(), scene_u, o, d))
    rec("packed_plain", timed(tr(), scene_p, o, d))
    rec("packed_warp", timed(trw(), scene_p, o, d))
    rec("unpacked_warp", timed(trw(), scene_u, o, d))
    rec("unpacked_primal_slice", timed(sl(), scene_u, jnp.uint32(0)))
    rec("packed_primal_slice", timed(sl(), scene_p, jnp.uint32(0)))
    # order check
    rec("unpacked_plain#2", timed(tr(), scene_u, o, d))

    import numpy as np

    a = np.asarray(tr()(scene_u, o, d))
    c = np.asarray(tr()(scene_p, o, d))
    same = (np.isfinite(a) == np.isfinite(c)).all() and np.allclose(
        a[np.isfinite(a)], c[np.isfinite(c)], atol=1e-5)
    out["equal"] = bool(same)
    print(f"  equal: {same}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
