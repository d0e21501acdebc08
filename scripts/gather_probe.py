#!/usr/bin/env python3
"""Device microbenchmarks of candidate gather formulations for the trace loop.

The sphere-trace inner loop is one (R, 64)-row gather per query per step
(ops/grid.build_stencil); BASELINE.md's measured XLA rate (~23 M rows/s on
v5e) sits ~35x below HBM bandwidth for these rows and is the wall between the
current bench number and the reference bar.  This probes, on real hardware:

  1. xla_take_rows        — jnp.take of (R,64) rows, N in {74k, 278k, 1M}
  2. xla_take_rows_sorted — same, indices pre-sorted (locality sensitivity)
  3. xla_per_tap          — the 64-scalar-gather formulation (context)
  4. analytic_trace       — sphere_trace with an analytic SDF: loop overhead
                            with NO grid gather at all
  5. sort_u32             — jnp.sort at wavefront size (cost of per-step
                            bucketing schemes)
  6. pallas_dyn_gather    — Mosaic per-lane gather (take_along_axis from a
                            replicated VMEM table): the brick-kernel core op
  7. pallas_dma_rows      — per-row async-copy gather HBM->VMEM (embedding-
                            lookup pattern), 8-deep DMA pipeline

Usage: python scripts/gather_probe.py   (on the TPU; PROBE_N=small for CPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


REPS = int(os.environ.get("PROBE_REPS", "8"))


def timed(f, *args):
    sync(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(REPS)]
    sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
    return (time.perf_counter() - t0) / REPS


def main():
    out = {}
    small = os.environ.get("PROBE_N") == "small"
    grid_res = 64
    R = (grid_res + 3) ** 3
    table = jax.random.normal(jax.random.PRNGKey(0), (R, 64), jnp.float32)
    flat = jax.random.normal(jax.random.PRNGKey(1), (grid_res**3,), jnp.float32)

    def rec(name, dt, n):
        out[name] = {"ms": round(dt * 1e3, 3), "Mrows_per_s": round(n / dt / 1e6, 1)}
        print(f"  {name:28s} {dt*1e3:9.3f} ms  {n/dt/1e6:9.1f} M rows/s", flush=True)

    print(f"platform={jax.devices()[0].platform} R={R}", flush=True)
    sizes = (74_000, 278_000, 1_000_000) if not small else (8_192,)

    for n in sizes:
        idx = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, R, jnp.int32)

        @jax.jit
        def take_rows(table, idx):
            return jnp.take(table, idx, axis=0)

        rec(f"xla_take_rows_{n//1000}k", timed(take_rows, table, idx), n)

    n = sizes[-1] if small else 278_000
    idx = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, R, jnp.int32)
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def take_rows(table, idx):
        return jnp.take(table, idx, axis=0)

    rec("xla_take_rows_sorted", timed(take_rows, table, idx_sorted), n)

    # row-rate sensitivity: table size (cache/TLB locality) and row width
    # (is the gather row-count-bound or byte-bound?)
    for tr, w in ((2048, 64), (R, 8), (R, 256)):
        tab2 = jax.random.normal(jax.random.PRNGKey(7), (tr, w), jnp.float32)
        idx2 = jax.random.randint(jax.random.PRNGKey(8), (n,), 0, tr, jnp.int32)

        @jax.jit
        def take2(tab, idx):
            return jnp.take(tab, idx, axis=0)

        rec(f"xla_take_R{tr//1000}k_w{w}", timed(take2, tab2, idx2), n)

    # REAL trace-step indices: stencil rows actually requested by the first
    # sphere-trace step of the Fig-9a bunny workload (spatially coherent in
    # pixel order — the regime the trace loop actually runs in, vs the
    # worst-case random indices above)
    try:
        from differentiable_sdf_rendering_tpu.models.camera import regular_cameras as _rc
        from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf as _ts
        from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF as _G

        _res = 64 if small else 272
        _spp = 2 if small else 4
        _cam = _rc(1, resx=_res, resy=_res).view(0)
        _n = _res * _res * _spp
        _pix = jnp.arange(_n, dtype=jnp.uint32) // _spp
        _pos = jnp.stack([(_pix % _res).astype(jnp.float32) + 0.5,
                          (_pix // _res).astype(jnp.float32) + 0.5], -1)
        _o, _d = _cam.sample_ray(_pos)
        _sdf = _G.create(_ts("bunny", grid_res))
        # entry points into the grid: position at t = bbox entry + 0.5 voxel
        _x = jnp.clip(_o + 2.05 * _d, 0.0, 1.0)
        _c = _x * grid_res - 0.5
        _b = jnp.clip(jnp.floor(_c).astype(jnp.int32), -2, grid_res) + 2
        _lin = (_b[:, 2] * (grid_res + 3) + _b[:, 1]) * (grid_res + 3) + _b[:, 0]

        @jax.jit
        def take_real(table, idx):
            return jnp.take(table, idx, axis=0)

        rec(f"xla_take_trace_coherent_{_n//1000}k", timed(take_real, table, _lin), _n)
    except Exception as e:  # noqa: BLE001
        print(f"  coherent-trace probe FAILED: {str(e)[:200]}", flush=True)

    # per-tap: 64 scalar gathers from the flat grid (the pre-stencil path)
    tap = jax.random.randint(jax.random.PRNGKey(3), (n, 4, 4, 4), 0, grid_res**3, jnp.int32)

    @jax.jit
    def per_tap(flat, tap):
        return jnp.take(flat, tap, axis=0)

    rec("xla_per_tap_64", timed(per_tap, flat, tap), n * 64)

    # trace-loop overhead without any gather: analytic sphere
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.ops.sdf import SphereSDF, TraceParams
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace

    res = 64 if small else 272
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    nl = res * res * 4
    lane = jnp.arange(nl, dtype=jnp.uint32)
    pix = lane // 4
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    sph = SphereSDF.create()

    @jax.jit
    def analytic(o, d):
        return sphere_trace(sph, o, d, TraceParams())

    dt = timed(analytic, o, d)
    out["analytic_trace"] = {"ms": round(dt * 1e3, 3),
                             "Mlanes_per_s": round(nl / dt / 1e6, 2)}
    print(f"  {'analytic_trace':28s} {dt*1e3:9.3f} ms  {nl/dt/1e6:9.2f} M lanes/s",
          flush=True)

    # sort cost at wavefront size (per-step bucketing feasibility)
    keys = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, 2**31 - 1, jnp.int32)
    rec("sort_i32", timed(jax.jit(jnp.sort), keys), n)

    # argsort + take (the full bucketing round trip)
    @jax.jit
    def argsort_take(keys, idx):
        order = jnp.argsort(keys)
        return jnp.take(idx, order, axis=0)

    rec("argsort_take", timed(argsort_take, keys, idx), n)

    # ---- Pallas probes (guarded: lowering support varies) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("PROBE_INTERPRET", "0") == "1"  # CPU correctness mode

    # 6. per-lane gather from a replicated VMEM table via take_along_axis.
    #    Table (2048, 128): each LANE holds a full copy of a 2048-entry
    #    table; a (8,128) index tile gathers per-lane rows — the core op of
    #    a brick-decomposed interpolation kernel.
    TR = 2048
    BLK = 4096  # queries per program

    def dyn_gather_kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        idx = idx_ref[:].reshape(BLK // 128, 128)
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=0).reshape(BLK)

    tabr = jax.random.normal(jax.random.PRNGKey(5), (TR, 128), jnp.float32)
    idxr = jax.random.randint(jax.random.PRNGKey(6), (n,), 0, TR, jnp.int32)
    n_pad = (n + BLK - 1) // BLK * BLK
    idxr = jnp.pad(idxr, (0, n_pad - n))

    @jax.jit
    def dyn_gather(tab, idx):
        return pl.pallas_call(
            dyn_gather_kernel,
            grid=(n_pad // BLK,),
            in_specs=[
                pl.BlockSpec((TR, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            interpret=interp,
        )(tab, idx)

    try:
        got = np.asarray(dyn_gather(tabr, idxr))[:n]
        # query q lands in lane q%128 and reads that column of its table row
        want = np.asarray(tabr)[np.asarray(idxr)[:n], np.arange(n) % 128]
        np.testing.assert_allclose(got, want, rtol=1e-6)
        rec("pallas_dyn_gather", timed(dyn_gather, tabr, idxr), n_pad)
    except Exception as e:  # noqa: BLE001
        out["pallas_dyn_gather"] = {"error": str(e)[:300]}
        print(f"  pallas_dyn_gather FAILED: {str(e)[:200]}", flush=True)

    # 7. per-row DMA gather (embedding-lookup pattern), 8 outstanding copies
    DBLK = 1024  # rows per program
    SLOTS = 8

    def dma_rows_kernel(idx_ref, tab_hbm, out_ref, sem):
        def get(b, slot):
            return pltpu.make_async_copy(
                tab_hbm.at[idx_ref[b]], out_ref.at[b], sem.at[slot]
            )

        for s in range(SLOTS):
            get(s, s).start()

        def body(b, _):
            slot = jax.lax.rem(b, SLOTS)
            # wait the row occupying this slot BEFORE reusing its semaphore
            get(b, slot).wait()

            @pl.when(b + SLOTS < DBLK)
            def _():
                get(b + SLOTS, slot).start()

            return 0

        jax.lax.fori_loop(0, DBLK - SLOTS, body, 0)
        for s in range(SLOTS):
            b = DBLK - SLOTS + s
            get(b, b % SLOTS).wait()

    n_pad2 = (n + DBLK - 1) // DBLK * DBLK
    idx2 = jnp.pad(idx, (0, n_pad2 - n))

    @jax.jit
    def dma_rows(tab, idx):
        return pl.pallas_call(
            dma_rows_kernel,
            grid=(n_pad2 // DBLK,),
            in_specs=[
                pl.BlockSpec((DBLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((DBLK, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad2, 64), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((SLOTS,))],
            interpret=interp,
        )(idx, tab)

    try:
        # wait() on a re-created handle: works because make_async_copy is a
        # descriptor (src, dst, sem), not a stateful object.
        got = np.asarray(dma_rows(table, idx2))[:n]
        np.testing.assert_allclose(got, np.asarray(table)[np.asarray(idx2)[:n]], rtol=1e-6)
        rec("pallas_dma_rows", timed(dma_rows, table, idx2), n_pad2)
    except Exception as e:  # noqa: BLE001
        out["pallas_dma_rows"] = {"error": str(e)[:300]}
        print(f"  pallas_dma_rows FAILED: {str(e)[:200]}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
