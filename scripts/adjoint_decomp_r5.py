#!/usr/bin/env python3
"""r5: where do the 233 ms of a bench adjoint slice actually go?

The adjoint is 0.86 µs/ray vs the primal's 0.27 — it is where the
vs_baseline gap lives (VERDICT r4 weak #1).  Times, with the warm-execution
protocol (first row is a sacrificial cold-start absorber):

  warp_trace_fwd        one primary warp trace (266k lanes)
  warp_trace_vjp        vjp of (warp trace → warp_t sum) w.r.t. data
  grad_fwd              full grad-mode render slice, forward only
  grad_fwd_vjp          the bench adjoint unit (fwd+vjp w.r.t. data)
  grad_fwd_vjp_notable  same but WITHOUT attached stencil (per-tap vjp)
  plain_trace           primal-mode trace (for reference)
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
from differentiable_sdf_rendering_tpu.ops.film import BORDER
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

WARM = int(os.environ.get("PROBE_WARM", "4"))
REPS = int(os.environ.get("PROBE_REPS", "6"))


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
    res, grid_res, k = 256, 128, 4
    spp_g = 64
    sdf_data = target_sdf("bunny", grid_res)
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(sdf_data, cameras=cams)
    scene = scene.replace(sdf=scene.sdf.prepare())
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)
    n = pw * k
    i = jnp.arange(n, dtype=jnp.uint32)
    lane = (i // k) * jnp.uint32(spp_g) + (i % k)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=spp_g)
    tp = cfg_g.trace

    pwx = res + 2 * b
    pix = lane // spp_g
    uni = lane_uniforms(1, lane, 6)
    pos = jnp.stack([(pix % pwx).astype(jnp.float32) - b + uni[:, 0],
                     (pix // pwx).astype(jnp.float32) - b + uni[:, 1]], -1)
    o, d = cam.sample_ray(pos)
    goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:24s} {dt*1e3:9.2f} ms", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n}", flush=True)

    # sacrificial cold-start absorber
    rec("_cold_absorber", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp)), scene, o, d))
    rec("plain_trace", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp)), scene, o, d))
    rec("warp_trace_fwd", timed(jax.jit(
        lambda s, o_, d_: sphere_trace_warp(s.sdf, o_, d_, tp).warp_t), scene, o, d))

    def wt_vjp(s, o_, d_):
        def f(data):
            st = s.sdf.stencil
            sdf2 = s.sdf.replace(
                data=data,
                stencil=None if st is None else gridops.attach_stencil(data, st))
            r = sphere_trace_warp(sdf2, o_, d_, tp)
            wt = jnp.where(jnp.isfinite(r.warp_t), r.warp_t, 0.0)
            return jnp.sum(wt * jnp.minimum(r.warp_weight, 1.0))

        return jax.grad(f)(s.sdf.data)

    rec("warp_trace_vjp", timed(jax.jit(wt_vjp), scene, o, d))

    rec("grad_fwd", timed(jax.jit(
        lambda s, c: render_lane_block(s, cam, lane + c * jnp.uint32(k), 1, cfg_g,
                                       "grad", dense_groups=k)),
        scene, jnp.uint32(0)))

    def adj(s, goal, c):
        def rf(data):
            st = s.sdf.stencil
            sdf2 = s.sdf.replace(
                data=data,
                stencil=None if st is None else gridops.attach_stencil(data, st))
            return render_lane_block(s.replace(sdf=sdf2), cam,
                                     lane + c * jnp.uint32(k), 1, cfg_g, "grad",
                                     dense_groups=k)

        _, vjp = jax.vjp(rf, s.sdf.data)
        return vjp(goal)[0]

    rec("grad_fwd_vjp", timed(jax.jit(adj), scene, goal, jnp.uint32(0)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
