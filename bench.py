#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Mirrors the reference's Figure-9a protocol
(``/root/reference/figures/benchmark/benchmark.py:23-118``): 256×256 pixels,
256 primal spp + 64 adjoint spp against a 128³ SDF, mean of N runs.
Headline metric: rays/s/chip through the forward+backward sphere trace
(primal renders + VJP of the reparameterized gradient render), plus
redistancing throughput (Fig. 9b).

The wavefront is sliced at the *host* level (several jit dispatches of an
spp-slice, film blocks accumulated on device) — the same throughput metric
as one giant program, but with small XLA programs that compile reliably
through the remote-TPU tunnel and bound HBM use, mirroring Dr.Jit's
wavefront cap (reparam.py:47-50).

Runs on the default JAX platform (the real TPU chip under the driver; set
BENCH_SCALE=small and JAX_PLATFORMS=cpu for a local smoke run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    # Default: the exact Fig-9a protocol (256², 256+64 spp, 128³), sliced
    # into 67.6 k-lane programs (BENCH_SLICE=1) — the class proven safe on
    # this v5e (r2: 635.9 k rays/s, no crash) after the eager gather-table
    # fix removed the compile/HBM OOMs that killed r1's full attempts.  The
    # watchdog ladder still falls back medium → small → CPU on failure.
    scale = os.environ.get("BENCH_SCALE", "full")
    if os.environ.get("BENCH_SMALL", "0") == "1":
        scale = "small"
    if scale == "medium" and "BENCH_SLICE" not in os.environ:
        os.environ["BENCH_SLICE"] = "4"
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_lane_block
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.film import BORDER, develop
    from differentiable_sdf_rendering_tpu.ops.redistance import redistance

    # film res / primal spp / adjoint spp / grid res / runs / spp per slice
    # (full = the reference's Fig-9a protocol: 256², 256+64 spp, 128³ SDF)
    # full slice_spp=8 (540k-lane programs, promoted r5 after a 2-run soak:
    # 2.65 M rays/s, t_adjoint 3.73 → 3.38 s; k=16 regresses the primal to
    # 5.09 s).  The r3 elementwise-jet rewrite shrank program temporaries
    # enough that this width is comfortably inside the proven-safe envelope.
    res, primal_spp, adjoint_spp, grid_res, n_runs, slice_spp = {
        "small": (64, 16, 8, 32, 2, 16),
        "medium": (128, 64, 16, 64, 3, 16),
        "full": (256, 256, 64, 128, 3, 8),
    }[scale]
    if "BENCH_SLICE" in os.environ:  # lanes-per-program override (fragile chips)
        slice_spp = int(os.environ["BENCH_SLICE"])
    if "BENCH_RUNS" in os.environ:  # e.g. 1 for a first cautious full-protocol run
        n_runs = int(os.environ["BENCH_RUNS"])

    sdf_data = target_sdf("bunny", grid_res)
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    scene = Scene.create(sdf_data, cameras=regular_cameras(1, resx=res, resy=res))
    # Build the gather tables once, outside jit, and ship them as argument
    # buffers — otherwise every slice dispatch rebuilds them in-program
    # (and a constant-captured grid would constant-fold the build into
    # 128×-padded literals: 50 GB compile OOM, device_r2b session).
    scene = scene.replace(sdf=scene.sdf.prepare())
    cfg_p = RenderConfig(integrator="sdf_direct_reparam", spp=primal_spp)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=adjoint_spp)
    b = BORDER
    pw = (res + 2 * b) * (res + 2 * b)

    # ---- primal: SPP-STRIDED slices of the lane space (all pixels × a few
    # spp-slots per program), accumulated on device.  Contiguous few-pixel
    # slices concentrate straggler pixels into a few programs while the
    # trace loop pays each program's worst lane — measured 141 vs 78 ms per
    # 270 k-lane slice on v5e (r3).  Same global lane ids → same estimate.
    n_primal = pw * primal_spp
    n_slices_p = max(1, primal_spp // slice_spp)
    sz_p = n_primal // n_slices_p
    k_p = primal_spp // n_slices_p
    i_p = jnp.arange(pw * k_p, dtype=jnp.uint32)
    base_p = (i_p // k_p) * jnp.uint32(primal_spp) + (i_p % k_p)

    @jax.jit
    def primal_slice(scene, block, c):
        lane = base_p + c * jnp.uint32(k_p)
        return block + render_lane_block(scene, cam, lane, 0, cfg_p, "primal",
                                         dense_groups=k_p)

    # ---- adjoint: VJP of one gradient-mode slice ----
    # Same lane width as the primal slices: the VJP wavefront is ~4× the
    # primal's, but a 279k-lane VJP ran fine in one program at medium
    # (profile_decomp r2) while 16 tiny programs paid 1.3× in per-dispatch
    # fixed cost.  BENCH_SLICE still bounds it on fragile chips.
    n_adj = pw * adjoint_spp
    n_slices_a = max(1, adjoint_spp // slice_spp)
    sz_a = n_adj // n_slices_a
    k_a = adjoint_spp // n_slices_a
    i_a = jnp.arange(pw * k_a, dtype=jnp.uint32)
    base_a = (i_a // k_a) * jnp.uint32(adjoint_spp) + (i_a % k_a)

    @jax.jit
    def adjoint_slice(scene, goal, c):
        lane = base_a + c * jnp.uint32(k_a)

        def rf(data):
            # Attach the PREBUILT tables to the traced data instead of
            # rebuilding in-jit: the in-jit build acquires 128×-padded
            # (N,1) operand layouts (69.7 GB of HLO temps at 128³ —
            # bench_full3 compile OOM); attach_stencil routes d/dtable
            # into d/ddata through a hand-written layout-friendly
            # transpose.  Valid because data IS scene.sdf.data here.
            from differentiable_sdf_rendering_tpu.ops import grid as gridops

            st = scene.sdf.stencil
            sdf2 = scene.sdf.replace(
                data=data,
                stencil=None if st is None else gridops.attach_stencil(data, st),
            )
            sc = scene.replace(sdf=sdf2)
            return render_lane_block(sc, cam, lane, 1, cfg_g, "grad",
                                     dense_groups=k_a)

        _, vjp = jax.vjp(rf, scene.sdf.data)
        (g,) = vjp(goal)
        return g

    def sync(x):
        # On the remote-TPU (axon) platform block_until_ready can return
        # before execution finishes; fetching data forces completion.
        return float(jnp.sum(x))

    goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)
    zero_block = jnp.zeros((res + 2 * b, res + 2 * b, 5), jnp.float32)

    def run_primal():
        block = zero_block
        for i in range(n_slices_p):
            block = primal_slice(scene, block, jnp.uint32(i))
        return develop(block, border=b)

    def run_adjoint():
        g = None
        for i in range(n_slices_a):
            gi = adjoint_slice(scene, goal, jnp.uint32(i))
            g = gi if g is None else g + gi
        return g

    # trivial-op round-trip latency — contextualizes results on the remote
    # TPU, whose dispatch path degrades after worker crashes (CLAUDE.md)
    triv = jax.jit(lambda a: (a * 2.0).sum())
    sync(triv(jnp.ones((8, 8))))
    t0 = time.perf_counter()
    sync(triv(jnp.ones((8, 8))))
    dispatch_ms = (time.perf_counter() - t0) * 1e3

    # warmup/compile
    sync(run_primal())
    sync(run_adjoint())

    t_primal, t_adj = [], []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        sync(run_primal())
        t_primal.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(run_adjoint())
        t_adj.append(time.perf_counter() - t0)

    tp = float(np.mean(t_primal))
    ta = float(np.mean(t_adj))
    rays_per_s = (n_primal + n_adj) / (tp + ta)

    # Fig 9b: redistancing throughput at the optimization resolution
    rphi = jax.jit(lambda x: redistance(x))
    x = sdf_data * 3.0
    sync(rphi(x))
    t0 = time.perf_counter()
    sync(rphi(x))
    t_redist = time.perf_counter() - t0

    # Reference bar: the paper's Fig-9a harness on an RTX Titan renders
    # ≈21.0 M rays in ≤4.75 s (plot axis cap, benchmark.ipynb) ≈ 4.4 M
    # rays/s — the number to match or beat (VERDICT r1 #1).
    ref_rays_per_s = 4.4e6
    result = {
        "metric": "rays/s/chip fwd+bwd sphere trace (Fig9a protocol)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / ref_rays_per_s, 3),
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
            "scale": scale,
            "dispatch_ms": round(dispatch_ms, 2),
        },
    }
    print(json.dumps(result))


def trace_variants():
    """BENCH_TRACE=1: device microbenchmark of the trace-loop variants
    (VERDICT r1 #3) — stencil-table vs per-tap gather, lane compaction
    on/off, Keinert over-relaxation — on the Fig-9a bunny workload.
    Prints one JSON line with per-variant milliseconds."""
    if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("BENCH_LOCAL_CPU") == "1":
        # sitecustomize pins the axon platform after import; force for real
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu()
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF, TraceParams
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace

    # full sweep uses spp=4 (262k lanes): the per-tap variant materializes
    # (N, 4, 4, 4) taps whose T(4,128) tiling pads 32× — 16 GB HLO temp at
    # 2M lanes (observed OOM, r3)
    res, spp, grid_res = {
        "small": (64, 8, 32), "medium": (128, 16, 64), "full": (256, 4, 128),
    }[os.environ.get("BENCH_SCALE", "medium")]
    # Prepare the gather tables EAGERLY and pass the SDF as a jit ARGUMENT:
    # a closure-captured constant grid lets XLA constant-fold the in-jit
    # table build into hundreds of 128×-padded literals (50 GB compile OOM,
    # device_r2b session), and an in-jit rebuild would bill table
    # construction to every variant anyway.
    sdf_bare = GridSDF.create(target_sdf("bunny", grid_res))
    sdf = sdf_bare.prepare()           # + stencil table (device buffer)
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    n = res * res * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pix = lane // spp
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)

    def sync(x):
        return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))

    # Dispatch on the remote tunnel is ASYNC (20 chained ops complete in one
    # ~26 ms round trip), so one fetch per K repeats amortizes tunnel latency
    # out of the per-trace time — a single timed call would just measure RTT.
    reps = int(os.environ.get("BENCH_TRACE_REPS", "8"))

    def timed(f, s):
        sync(f(s, o, d))  # compile + warm
        t0 = time.perf_counter()
        outs = [f(s, o, d) for _ in range(reps)]  # enqueue all...
        # ...then ONE fetch of a value depending on every rep (each sync()
        # is a full tunnel round trip, ~30 ms — fetching per rep would
        # re-introduce exactly the latency this amortizes away)
        sync(sum(jnp.ravel(r)[0] for r in outs))
        return (time.perf_counter() - t0) / reps

    # r2/r3 device sweeps: early compaction (4,16,128) is the big lever
    # (62.6 ms vs 338 for (8,64) per fwd trace at 262k lanes); tile-shared
    # window tracing measured dead even once the jet contractions were
    # fixed (r3: 65.3 vs 65.7 ms) and was DELETED (VERDICT r2 #7).
    C4 = (4, 16, 128)
    variants = {
        # throwaway: absorbs the first-timed-variant artifact (~280 ms —
        # the async eager table build + tunnel settling flush into the
        # first timed fetch; observed twice in r2 device sweeps)
        "_warmup": TraceParams(),
        "stencil+compact4": TraceParams(compact_stages=C4),
        "stencil+compact8": TraceParams(compact_stages=(8, 64)),
        "stencil+c4+unroll2": TraceParams(compact_stages=C4, unroll=2),
        # r4: earlier/finer compaction schedules — stage-0 full-width
        # iterations are ~half the trace cost (slice_decomp_r4)
        "stencil+c2-4": TraceParams(compact_stages=(2, 4, 16, 128)),
        "stencil+c2-8": TraceParams(compact_stages=(2, 8, 64)),
        "stencil+c4-8": TraceParams(compact_stages=(4, 8, 32, 128)),
        "norefine+c4": TraceParams(compact_stages=C4, refine_intersection=False),
        "refine_fixed+c4": TraceParams(compact_stages=C4, refine="fixed"),
        "pertap+c4": None,  # stencil suppressed via bare (unprepared) path
        "overrelax+c4": TraceParams(over_relax=1.4, compact_stages=C4),
        # the grad-mode warp trace (jets + accumulators, the adjoint driver)
        "warp+c4": ("warp", TraceParams(compact_stages=C4)),
        "warp+c2-4": ("warp", TraceParams(compact_stages=(2, 4, 16, 128))),
    }
    times = {}
    for name, params in variants.items():
        if isinstance(params, tuple):
            from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace_warp

            p = params[1]
            dt = timed(jax.jit(lambda s, o, d, p=p: sphere_trace_warp(s, o, d, p).warp_t), sdf)
            times[name] = round(dt * 1e3, 2)
            continue
        if name == "pertap+c4":
            # defeat the stencil: mark the grid as too large for the table
            from differentiable_sdf_rendering_tpu.ops import grid as gridops

            saved = gridops._STENCIL_MAX_VOXELS
            gridops._STENCIL_MAX_VOXELS = 0
            try:
                dt = timed(jax.jit(lambda s, o, d: sphere_trace(
                    s, o, d, TraceParams(compact_stages=(4, 16, 128)))), sdf_bare)
            finally:
                gridops._STENCIL_MAX_VOXELS = saved
        elif params is None:
            continue
        else:
            dt = timed(jax.jit(lambda s, o, d, p=params: sphere_trace(s, o, d, p)), sdf)
        if name == "_warmup":
            continue
        times[name] = round(dt * 1e3, 2)
    print(json.dumps({
        "metric": "trace-variant device ms (one fwd trace, %dk lanes)" % (n // 1000),
        "value": times.get("stencil+compact4", 0.0),
        "unit": "ms",
        "vs_baseline": 0.0,
        "detail": {"n_lanes": n, "grid": grid_res, "times_ms": times,
                   "platform": jax.devices()[0].platform},
    }))
    return 0


def _probe():
    """Child-process pre-flight: compile + run one trivial op on the default
    platform.  A healthy chip answers in ~1-90 s; a crashed worker's compile
    helper hangs indefinitely (CLAUDE.md), which the parent's timeout
    converts into 'dead'."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * 2.0).sum())
    assert float(f(jnp.ones((8, 8)))) == 128.0
    print("probe-ok", jax.devices()[0].platform)
    return 0


def _main_with_fallback():
    """Watchdog driver: each scale runs in a subprocess with a hard timeout
    (the remote TPU's compile helper has been observed to hang indefinitely
    after worker crashes — see CLAUDE.md).  A 480 s pre-flight probe skips
    the device rungs entirely when the worker is dead, then falls back
    medium → small → local CPU, so the unattended round-end run always
    emits ONE JSON line — in ~15 min instead of ~55 when the TPU is down."""
    import subprocess

    ladder = [
        (os.environ.get("BENCH_SCALE", "full"), {}, 2100),
        ("medium", {}, 1500),
        ("small", {}, 900),
        ("small", {"JAX_PLATFORMS": "cpu", "BENCH_LOCAL_CPU": "1"}, 1000),
    ]
    if os.environ.get("BENCH_LOCAL_CPU") == "1" or os.environ.get("JAX_PLATFORMS") == "cpu":
        alive = True  # everything runs locally anyway; nothing to probe
    else:
        try:
            # 480 s: the degraded compile helper has been observed to take
            # >200 s for even a trivial jit while still completing the
            # medium protocol fine — don't false-negative to CPU
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=480,
                env={**os.environ, "BENCH_PROBE": "1"},
            )
            alive = r.returncode == 0 and "probe-ok" in r.stdout
        except subprocess.TimeoutExpired:
            alive = False
    if not alive:
        print("[bench] device pre-flight probe failed; falling straight to "
              "the local-CPU rung", file=sys.stderr)
        ladder = [rung for rung in ladder if rung[1].get("JAX_PLATFORMS") == "cpu"]
    for scale, extra_env, tmo in ladder:
        env = {**os.environ, "BENCH_SCALE": scale, "BENCH_CHILD": "1", **extra_env}
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=tmo, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] scale={scale} env={list(extra_env)} timed out after {tmo}s", file=sys.stderr)
            continue
        line = next((ln for ln in r.stdout.splitlines() if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return 0
        print(f"[bench] scale={scale} failed rc={r.returncode}: {r.stderr[-400:]}", file=sys.stderr)
    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd sphere trace (Fig9a protocol)",
        "value": 0.0,
        "unit": "rays/s",
        "vs_baseline": 0.0,
        "detail": {"error": "all bench scales failed or timed out (TPU compile helper hang?)"},
    }))
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_PROBE") == "1":
        sys.exit(_probe())
    if os.environ.get("BENCH_TRACE") == "1":
        sys.exit(trace_variants())
    if os.environ.get("BENCH_CHILD") == "1":
        if os.environ.get("BENCH_LOCAL_CPU") == "1":
            try:
                from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

                force_cpu()
            except Exception:
                pass
        sys.exit(main())
    sys.exit(_main_with_fallback())
