#!/usr/bin/env python3
"""Decompose the bench adjoint-pass cost on device (VERDICT r2 perf work).

The medium-protocol bench showed t_primal=1.3 s vs t_adjoint=13.3 s — a 40x
imbalance. This script times, with async-amortized fetches (dispatch on the
remote tunnel is async; one fetch per K reps removes the ~26 ms RTT):

  * primal render slice (reference point)
  * grad-mode render forward only
  * full VJP of the grad-mode render (the bench adjoint unit)
  * VJP of the bare grid stencil eval (isolates the gather->scatter cost)
  * adjoint slice-size scaling (spp 1 / 4 / 16 per program)

Run on the real TPU: `python scripts/profile_decomp.py`; local smoke:
`JAX_PLATFORMS=cpu DECOMP_SCALE=small python scripts/profile_decomp.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import (
    RenderConfig,
    render_lane_block,
)
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops.film import BORDER
from differentiable_sdf_rendering_tpu.ops.grid import grid_eval_all


def main():
    scale = os.environ.get("DECOMP_SCALE", "medium")
    res, grid_res = {"small": (64, 32), "medium": (128, 64), "full": (256, 128)}[scale]
    reps = int(os.environ.get("DECOMP_REPS", "6"))

    sdf_data = target_sdf("bunny", grid_res)
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(sdf_data, cameras=cams)
    # Eager gather tables as argument buffers (mirrors bench.py; an
    # unprepared scene bills a per-dispatch in-jit table rebuild and —
    # for the jet rows below — silently measures the 64-row per-tap path)
    scene = scene.replace(sdf=scene.sdf.prepare())
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)

    def sync(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    def timed(f, *args):
        sync(f(*args))  # compile + warm
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(reps)]
        # ONE fetch depending on every rep: each sync() is a ~30 ms tunnel
        # round trip, so fetching per rep would measure RTT, not the device.
        sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
        return (time.perf_counter() - t0) / reps

    out = {}

    def record(name, dt, n_lanes):
        out[name] = {"ms": round(dt * 1e3, 2),
                     "Mlanes_per_s": round(n_lanes / dt / 1e6, 3)}
        print(f"  {name:36s} {dt*1e3:9.2f} ms  {n_lanes/dt/1e6:8.3f} M lanes/s",
              flush=True)

    print(f"platform={jax.devices()[0].platform} scale={scale} film={res} "
          f"grid={grid_res}", flush=True)

    # --- primal slice (16 spp worth of lanes, like the bench) ---
    cfg_p = RenderConfig(integrator="sdf_direct_reparam", spp=64)
    n_p = pw * 16

    @jax.jit
    def primal_slice(scene, off):
        lane = off + jnp.arange(n_p, dtype=jnp.uint32)
        return render_lane_block(scene, cam, lane, 0, cfg_p, "primal")

    record("primal fwd (16spp slice)", timed(primal_slice, scene, jnp.uint32(0)), n_p)

    # --- grad-mode forward + VJP at several slice sizes ---
    for slice_spp in (1, 4, 16):
        cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=16)
        n_a = pw * slice_spp
        goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)

        @jax.jit
        def grad_fwd(scene, off, n_a=n_a, cfg_g=cfg_g):
            lane = off + jnp.arange(n_a, dtype=jnp.uint32)
            return render_lane_block(scene, cam, lane, 1, cfg_g, "grad")

        @jax.jit
        def adjoint(scene, goal, off, n_a=n_a, cfg_g=cfg_g):
            lane = off + jnp.arange(n_a, dtype=jnp.uint32)

            def rf(data):
                # with_data re-derives the tables from the traced data so
                # the VJP flows through them (never .replace on prepared)
                sc = scene.replace(sdf=scene.sdf.with_data(data))
                return render_lane_block(sc, cam, lane, 1, cfg_g, "grad")

            _, vjp = jax.vjp(rf, scene.sdf.data)
            (g,) = vjp(goal)
            return g

        record(f"grad fwd only   (spp={slice_spp:2d})",
               timed(grad_fwd, scene, jnp.uint32(0)), n_a)
        record(f"grad fwd+VJP    (spp={slice_spp:2d})",
               timed(adjoint, scene, goal, jnp.uint32(0)), n_a)

    # --- bare grid-eval jet VJP (isolates gather->scatter) ---
    for n_q in (pw, pw * 4):
        x = jax.random.uniform(jax.random.PRNGKey(0), (n_q, 3),
                               minval=0.2, maxval=0.8)
        gsdf = scene.sdf

        @jax.jit
        def jet_fwd(data, x):
            s = gsdf.with_data(data)
            f, g, H = s.eval_all(x)
            return f, g

        @jax.jit
        def jet_vjp(data, x):
            def f(d):
                s = gsdf.with_data(d)
                v, g, H = s.eval_all(x)
                return jnp.sum(v) + jnp.sum(g)

            return jax.grad(f)(data)

        record(f"grid jet fwd    (n={n_q//1000}k)", timed(jet_fwd, gsdf.data, x), n_q)
        record(f"grid jet VJP    (n={n_q//1000}k)", timed(jet_vjp, gsdf.data, x), n_q)

    # --- the grad-mode forward's two big pieces in isolation ---
    from differentiable_sdf_rendering_tpu.ops.sdf import TraceParams
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace_warp
    from differentiable_sdf_rendering_tpu.ops.warp import WarpConfig, reparameterize

    n_w = pw * 4
    lane = jnp.arange(n_w, dtype=jnp.uint32)
    pix = lane // 4
    w = res + 2 * b
    pos = jnp.stack([(pix % w).astype(jnp.float32) + 0.5,
                     (pix // w).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)

    @jax.jit
    def wtrace(s, o, d):
        return sphere_trace_warp(s, o, d, TraceParams()).warp_t

    @jax.jit
    def reparam_fwd(s, o, d):
        return reparameterize(s, o, d, WarpConfig(), TraceParams())[1]

    @jax.jit
    def reparam_vjp(data, o, d):
        def f(dd):
            s = scene.sdf.with_data(dd)
            _, d1, det = reparameterize(s, o, d, WarpConfig(), TraceParams())
            return jnp.sum(d1) + jnp.sum(det)

        return jax.grad(f)(data)

    record(f"warp trace fwd  (n={n_w//1000}k)", timed(wtrace, scene.sdf, o, d), n_w)
    record(f"reparam fwd     (n={n_w//1000}k)", timed(reparam_fwd, scene.sdf, o, d), n_w)
    record(f"reparam VJP     (n={n_w//1000}k)", timed(reparam_vjp, scene.sdf.data, o, d), n_w)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
