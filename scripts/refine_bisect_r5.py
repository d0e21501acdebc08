#!/usr/bin/env python3
"""r5: reconcile the 5-17× refine/primal-slice cost discrepancy between
slice_decomp_r4 (primary_trace 428 ms, primal_slice_full 1310 ms) and
bench.py / trace_variants (primal slice 74 ms, plain trace 69 ms) — all on
the SAME healthy chip (VERDICT r4 weak #1 / next #2a).

Bisects one factor at a time on a 270 k-lane plain trace at 128³:
ray jitter, spp-strided vs duplicated rays, refine on/off, refine stages/
unroll, and an exact clone of bench's primal_slice call pattern.
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
import jax.numpy as jnp

enable_compile_cache()

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_lane_block
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops import trace as trace_mod
from differentiable_sdf_rendering_tpu.ops.film import BORDER
from differentiable_sdf_rendering_tpu.ops.sampling import lane_uniforms
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace

REPS = int(os.environ.get("PROBE_REPS", "6"))


def main():
    res, grid_res = 256, 128
    k = 4
    sdf_data = target_sdf("bunny", grid_res)
    cams = regular_cameras(1, resx=res, resy=res)
    cam = cams.view(0)
    scene = Scene.create(sdf_data, cameras=cams)
    scene = scene.replace(sdf=scene.sdf.prepare())
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)
    spp = 256
    n = pw * k
    i = jnp.arange(n, dtype=jnp.uint32)
    lane = (i // k) * jnp.uint32(spp) + (i % k)
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=spp)
    tp = cfg.trace

    # jittered rays (slice_decomp style = what the real renderer traces)
    pwx = res + 2 * b
    pix = lane // spp
    py = (pix // pwx).astype(jnp.float32) - b
    px = (pix % pwx).astype(jnp.float32) - b
    uni = lane_uniforms(0, lane, 6)
    pos_j = jnp.stack([px + uni[:, 0], py + uni[:, 1]], axis=-1)
    o_j, d_j = cam.sample_ray(pos_j)
    # center rays (trace_variants style)
    pos_c = jnp.stack([px + 0.5, py + 0.5], axis=-1)
    o_c, d_c = cam.sample_ray(pos_c)

    def sync(x):
        return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))

    def timed(f, *args):
        sync(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(REPS)]
        sync(sum(jnp.ravel(r)[0] for r in outs))
        return (time.perf_counter() - t0) / REPS

    out = {}

    def rec(name, dt):
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:34s} {dt*1e3:9.2f} ms", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n} grid={grid_res}", flush=True)

    tr = jax.jit(lambda s, o, d: sphere_trace(s.sdf, o, d, tp))
    tr_nr = jax.jit(lambda s, o, d: sphere_trace(
        s.sdf, o, d, dataclasses.replace(tp, refine_intersection=False)))

    rec("warmup(center+refine)", timed(tr, scene, o_c, d_c))
    rec("center+refine", timed(tr, scene, o_c, d_c))
    rec("jitter+refine", timed(tr, scene, o_j, d_j))
    rec("jitter+norefine", timed(tr_nr, scene, o_j, d_j))
    rec("center+norefine", timed(tr_nr, scene, o_c, d_c))
    # repeat the pathological one to rule out ordering effects
    rec("jitter+refine#2", timed(tr, scene, o_j, d_j))

    # refine structure variants (module knobs)
    for name, stages, unroll in [
        ("jitter+refine-unroll1", (2, 8, 64), 1),
        ("jitter+refine-nostage", (), 1),
        ("jitter+refine-stages4-16", (4, 16, 128), 5),
        ("jitter+refine-unroll2", (2, 8, 64), 2),
    ]:
        trace_mod._REFINE_STAGES, trace_mod._REFINE_UNROLL = stages, unroll
        f = jax.jit(lambda s, o, d, _n=name: sphere_trace(s.sdf, o, d, tp))
        rec(name, timed(f, scene, o_j, d_j))
    trace_mod._REFINE_STAGES, trace_mod._REFINE_UNROLL = (2, 8, 64), 5

    # exact clone of bench.primal_slice (74 ms in bench)
    base_p = lane

    @jax.jit
    def primal_slice(scene, block, c):
        ln = base_p + c * jnp.uint32(k)
        return block + render_lane_block(scene, cam, ln, 0, cfg, "primal",
                                         dense_groups=k)

    zero_block = jnp.zeros((res + 2 * b, res + 2 * b, 5), jnp.float32)
    sync(primal_slice(scene, zero_block, jnp.uint32(0)))
    t0 = time.perf_counter()
    blk = zero_block
    for c in range(8):
        blk = primal_slice(scene, blk, jnp.uint32(c))
    sync(blk[..., 0])
    rec("bench_clone_8slices/8", (time.perf_counter() - t0) / 8)

    # probe-style: same slice repeated with fixed c
    rec("probe_style_slice_c0", timed(
        jax.jit(lambda s, c: render_lane_block(s, cam, base_p + c * jnp.uint32(k),
                                               0, cfg, "primal", dense_groups=k)),
        scene, jnp.uint32(0)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
