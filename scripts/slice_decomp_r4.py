#!/usr/bin/env python3
"""r4: where does a full-protocol bench slice actually spend its time?

Times (async-amortized) on the Fig-9a workload (256², 128³, 270 k-lane
spp-strided slices):
  primal full          the bench primal slice (render_lane_block, direct)
  primary_trace        just the camera-ray sphere_trace of that slice
  primary_norefine     same without refinement
  fused_2n_trace       the NEE+MIS shadow/BSDF trace (2N lanes, occlusion-
                       masked refine) at representative origins
  splat_only           the scatter-free film splat of precomputed values
  adjoint fwd          grad-mode forward of a slice
  adjoint fwd+vjp      the bench adjoint unit
Variants: BENCH_SLICE spp per program (default 4).
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
from differentiable_sdf_rendering_tpu.ops.film import BORDER
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

REPS = int(os.environ.get("PROBE_REPS", "6"))


def main():
    small = os.environ.get("PROBE_N") == "small"
    res, grid_res = (64, 32) if small else (256, 128)
    k = int(os.environ.get("BENCH_SLICE", "4"))
    sdf_data = target_sdf("bunny", grid_res)
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    scene = Scene.create(sdf_data, cameras=regular_cameras(1, resx=res, resy=res))
    scene = scene.replace(sdf=scene.sdf.prepare())
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)
    spp = 256 if not small else 16
    n = pw * k
    i = jnp.arange(n, dtype=jnp.uint32)
    lane = (i // k) * jnp.uint32(spp) + (i % k)
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=spp)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=64 if not small else 8)

    # the slice's actual rays
    pwx = res + 2 * b
    pix = lane // spp
    py = (pix // pwx).astype(jnp.float32) - b
    px = (pix % pwx).astype(jnp.float32) - b
    uni = lane_uniforms(0, lane, 6)
    pos = jnp.stack([px + uni[:, 0], py + uni[:, 1]], axis=-1)
    o, d = cam.sample_ray(pos)

    def sync(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    def timed(f, *args):
        sync(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(REPS)]
        sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
        return (time.perf_counter() - t0) / REPS

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:24s} {dt*1e3:9.2f} ms", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n} grid={grid_res} k={k}", flush=True)

    import dataclasses

    tp = cfg.trace
    rec("primary_trace", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp)), scene, o, d))
    rec("primary_norefine", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(
            s.sdf, o_, d_,
            dataclasses.replace(tp, refine_intersection=False))), scene, o, d))
    rec("warp_trace", timed(jax.jit(
        lambda s, o_, d_: sphere_trace_warp(s.sdf, o_, d_, tp).warp_t), scene, o, d))

    # fused 2N occlusion/scatter trace at plausible secondary origins
    x = o + 1.5 * d  # roughly mid-box
    o2 = jnp.concatenate([x, x], 0)
    d2 = jnp.concatenate([d, -d], 0)
    occl = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(n, bool)], 0)
    rec("fused_2n_trace", timed(jax.jit(
        lambda s, o_, d_: sphere_trace(s.sdf, o_, d_, tp, refine_active=~occl)),
        scene, o2, d2))

    rec("primal_slice_full", timed(jax.jit(
        lambda s, c: render_lane_block(s, cam, lane + c * jnp.uint32(k), 0, cfg,
                                       "primal", dense_groups=k)),
        scene, jnp.uint32(0)))

    # adjoint at the bench slice size
    spp_g = cfg_g.spp
    n_a = pw * k
    ia = jnp.arange(n_a, dtype=jnp.uint32)
    lane_a = (ia // k) * jnp.uint32(spp_g) + (ia % k)
    goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)

    rec("grad_fwd", timed(jax.jit(
        lambda s, c: render_lane_block(s, cam, lane_a + c * jnp.uint32(k), 1, cfg_g,
                                       "grad", dense_groups=k)),
        scene, jnp.uint32(0)))

    @jax.jit
    def adj(s, goal, c):
        from differentiable_sdf_rendering_tpu.ops import grid as gridops

        def rf(data):
            st = s.sdf.stencil
            sdf2 = s.sdf.replace(
                data=data,
                stencil=None if st is None else gridops.attach_stencil(data, st))
            return render_lane_block(s.replace(sdf=sdf2), cam,
                                     lane_a + c * jnp.uint32(k), 1, cfg_g, "grad",
                                     dense_groups=k)
        _, vjp = jax.vjp(rf, s.sdf.data)
        return vjp(goal)[0]

    rec("grad_fwd_vjp", timed(adj, scene, goal, jnp.uint32(0)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
