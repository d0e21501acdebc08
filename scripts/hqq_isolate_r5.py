#!/usr/bin/env python3
"""r5: isolate which hqq-class program kills the v5e worker.

Runs, separately and in increasing risk order, with forced fetches between:
  1. packed-table plain + warp trace at 256³ (262k lanes) — first device
     validation + timing of the (⌈n/2⌉, 128) packed layout;
  2. one 131k-lane grad-mode fwd slice at 256³ per-tap (no table);
  3. the same slice's fwd+vjp (the exact program class the hqq train step
     dispatches).
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
from differentiable_sdf_rendering_tpu.ops.sdf import TraceParams
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

WARM = int(os.environ.get("PROBE_WARM", "3"))
REPS = int(os.environ.get("PROBE_REPS", "4"))


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
    res, grid_res = 256, 256
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(target_sdf("bunny", grid_res), cameras=cams)
    print("building packed table...", flush=True)
    t0 = time.perf_counter()
    scene = scene.replace(sdf=scene.sdf.prepare())
    print(f"table built {time.perf_counter()-t0:.1f}s shape={scene.sdf.stencil.shape}",
          flush=True)

    b = 2
    pw = (res + 2 * b) * (res + 2 * b)
    spp = 256
    n = pw * 4
    i = jnp.arange(n, dtype=jnp.uint32)
    lane = (i // 4) * jnp.uint32(spp) + (i % 4)
    from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms

    pwx = res + 2 * b
    pix = lane // spp
    uni = lane_uniforms(0, lane, 6)
    pos = jnp.stack([(pix % pwx).astype(jnp.float32) - b + uni[:, 0],
                     (pix // pwx).astype(jnp.float32) - b + uni[:, 1]], -1)
    o, d = cam.sample_ray(pos)
    tp = TraceParams(compact_stages=(4, 16, 128))

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:28s} {dt*1e3:9.2f} ms", flush=True)

    rec("_cold", timed(jax.jit(lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp)),
                       scene, o, d))
    rec("packed_plain_256", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp)), scene, o, d))
    rec("packed_warp_256", timed(jax.jit(
        lambda s, o_, d_: sphere_trace_warp(s.sdf, o_, d_, tp).warp_t), scene, o, d))

    # per-tap grad slice (exactly the hqq train-grad program class)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=64)
    bare = scene.replace(sdf=scene.sdf.replace(stencil=None))
    kg = 1
    ng = pw * kg  # 67600 ≤ 131k bound
    ig = jnp.arange(ng, dtype=jnp.uint32)
    lane_g = (ig // kg) * jnp.uint32(64) + (ig % kg)
    print("grad fwd (per-tap)...", flush=True)
    rec("pertap_grad_fwd_256", timed(jax.jit(
        lambda s, c: render_lane_block(s, cam, lane_g + c, 1, cfg_g, "grad",
                                       dense_groups=kg)),
        bare, jnp.uint32(0)))

    goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)

    def adj(s, goal, c):
        def rf(data):
            return render_lane_block(
                s.replace(sdf=s.sdf.replace(data=data)), cam, lane_g + c, 1,
                cfg_g, "grad", dense_groups=kg)

        _, vjp = jax.vjp(rf, s.sdf.data)
        return vjp(goal)[0]

    print("grad fwd+vjp (per-tap)...", flush=True)
    rec("pertap_grad_vjp_256", timed(jax.jit(adj), bare, goal, jnp.uint32(0)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
