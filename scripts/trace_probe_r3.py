#!/usr/bin/env python3
"""Round-3 device probes: where does the trace loop's time actually go?

Round-2 facts that motivate these probes (BASELINE.md, gather_full.log):
  * a gather-FREE analytic sphere_trace runs at only 3.2 M lanes/s — the
    lax.while_loop machinery itself is a wall, independent of the gather;
  * XLA row gathers: 2.9 M rows/s coherent, 46 M rows/s strictly sorted,
    55.8 M rows/s from a small (cache-resident) table at ANY index order;
  * the grad-mode FORWARD (3 warp traces), not the VJP, dominates the
    adjoint (decomp.log: fwd 1081 ms vs +320 ms for the VJP at 272 k lanes).

Probes (each guarded; select with PROBE_ONLY=name1,name2):
  loop:   per-iteration cost of while_loop vs fori_loop at several widths
          (is the cond reduction/sync the overhead, or the body kernels?)
  inloop: stencil-row gather rate INSIDE a while_loop with trace-like
          coherent advancing indices (vs the isolated-probe 2.9 M rows/s)
  body:   one full-width warp-trace body iteration as a straight-line jit
          (the per-iteration compute floor without any loop machinery)
  jitter: near-sorted gather rates (sorted + ±k-row jitter) — how much of
          the 46 M rows/s survives approximate sorting
  pallas: fused analytic sphere-trace kernel (whole loop inside ONE Pallas
          program) — the Pallas loop-rate ceiling vs XLA's 3.2 M lanes/s
  pgather: per-lane gather from a replicated VMEM table via
          take_along_axis (the brick-kernel core op; retry of r2's failed
          probe with full error reporting)
  pdma:   per-row DMA gather HBM→VMEM (embedding-lookup pattern, retry)

Usage: python scripts/trace_probe_r3.py          (on the TPU)
       JAX_PLATFORMS=cpu PROBE_N=small PROBE_INTERPRET=1 python scripts/trace_probe_r3.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache, force_cpu

if os.environ.get("JAX_PLATFORMS") == "cpu":
    force_cpu()  # sitecustomize pins axon; the env var alone is ignored

import jax
import jax.numpy as jnp
import numpy as np

enable_compile_cache()

REPS = int(os.environ.get("PROBE_REPS", "6"))
SMALL = os.environ.get("PROBE_N") == "small"
ONLY = os.environ.get("PROBE_ONLY", "").split(",") if os.environ.get("PROBE_ONLY") else None
OUT = {}


def want(name):
    return ONLY is None or any(name.startswith(o) for o in ONLY)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(f, *args):
    sync(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(REPS)]
    sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
    return (time.perf_counter() - t0) / REPS


def rec(name, dt, n, unit="Mlanes"):
    OUT[name] = {"ms": round(dt * 1e3, 3), f"{unit}_per_s": round(n / dt / 1e6, 2)}
    print(f"  {name:40s} {dt*1e3:9.3f} ms  {n/dt/1e6:9.2f} {unit}/s", flush=True)


def fail(name, e):
    OUT[name] = {"error": repr(e)[:400]}
    print(f"  {name} FAILED: {repr(e)[:200]}", flush=True)
    if os.environ.get("PROBE_TRACEBACK"):
        traceback.print_exc()


# ---------------------------------------------------------------- loop cost
def probe_loop():
    K = 32
    widths = (2_048,) if SMALL else (262_144, 65_536, 16_384, 2_048)
    for n in widths:
        t0 = jnp.zeros((n,), jnp.float32)

        def body_state(s):
            t, a, i = s
            f = 0.5 - t * 0.01  # trivial "SDF"
            t = jnp.where(a, t + jnp.abs(f) * 0.001, t)
            a = a & (i < K)
            return t, a, i + 1

        @jax.jit
        def run_while(t0):
            s = (t0, jnp.ones_like(t0, bool), jnp.zeros((), jnp.int32))
            return jax.lax.while_loop(
                lambda s: jnp.any(s[1]), body_state, s
            )[0]

        @jax.jit
        def run_fori(t0):
            s = (t0, jnp.ones_like(t0, bool), jnp.zeros((), jnp.int32))
            return jax.lax.fori_loop(0, K, lambda k, s: body_state(s), s)[0]

        # lane-mask cond (the real trace's cond reduces a PER-LANE mask)
        @jax.jit
        def run_while_lanemask(t0):
            s = (t0, jnp.ones_like(t0, bool), jnp.zeros_like(t0, jnp.int32))

            def body(s):
                t, a, i = s
                f = 0.5 - t * 0.01
                t = jnp.where(a, t + jnp.abs(f) * 0.001, t)
                a = a & (i < K)
                return t, a, i + 1

            return jax.lax.while_loop(lambda s: jnp.any(s[1]), body, s)[0]

        it = K + 1
        rec(f"while_trivial_n{n//1000}k", timed(run_while, t0) / it, n, "Mlanes/iter")
        rec(f"fori_trivial_n{n//1000}k", timed(run_fori, t0) / K, n, "Mlanes/iter")
        rec(f"while_lanemask_n{n//1000}k", timed(run_while_lanemask, t0) / it, n,
            "Mlanes/iter")

        # a body with warp-trace-like state volume (13 leaves, several (N,3))
        def fat_body(s):
            t, a, i, v1, v2, v3, w1, w2, w3 = s
            f = 0.5 - t * 0.01
            g = jnp.stack([f, f * 0.5, f * 0.25], -1)
            t = jnp.where(a, t + jnp.abs(f) * 0.001, t)
            v1 = v1 + jnp.where(a[..., None], g, 0.0)
            v2 = v2 + v1 * 0.5
            v3 = jnp.where(a[..., None], v3 + g * t[..., None], v3)
            w1 = w1 + jnp.where(a, f * t, 0.0)
            w2 = w2 + w1 * 0.1
            w3 = jnp.where(a, w3 + f, w3)
            a = a & (i < K)
            return t, a, i + 1, v1, v2, v3, w1, w2, w3

        @jax.jit
        def run_fat(t0):
            z3 = jnp.zeros((n, 3), jnp.float32)
            z = jnp.zeros((n,), jnp.float32)
            s = (t0, jnp.ones_like(t0, bool), jnp.zeros((), jnp.int32),
                 z3, z3, z3, z, z, z)
            return jax.lax.while_loop(lambda s: jnp.any(s[1]), fat_body, s)[0]

        rec(f"while_fatstate_n{n//1000}k", timed(run_fat, t0) / it, n, "Mlanes/iter")


# ---------------------------------------------------- in-loop gather rate
def probe_inloop():
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.grid import build_stencil

    grid_res = 32 if SMALL else int(os.environ.get("PROBE_GRID", "64"))
    n = 4_096 if SMALL else 262_144
    K = 16
    data = target_sdf("bunny", grid_res)
    table = jax.jit(build_stencil)(jnp.asarray(data))
    R = (grid_res + 3) ** 3
    stride = (grid_res + 3) ** 2  # one z-layer per step: coherent advance

    # trace-like: all lanes start at pixel-coherent rows, advance together
    base = (jnp.arange(n, dtype=jnp.int32) // 4) % (R // 2)

    @jax.jit
    def run(table, base):
        def body(s):
            acc, i = s
            idx = jnp.minimum(base + i * stride // 8, R - 1)
            rows = jnp.take(table, idx, axis=0)  # (n, 64)
            return acc + rows[:, 0], i + 1

        return jax.lax.while_loop(
            lambda s: s[1] < K, body, (jnp.zeros((n,), jnp.float32), jnp.int32(0))
        )[0]

    rec(f"inloop_take_rows_n{n//1000}k", timed(run, table, base) / K, n, "Mrows/iter")

    # same but the whole jet consumed (value+grad+hess einsum chain)
    from differentiable_sdf_rendering_tpu.ops.grid import bspline_weights

    @jax.jit
    def run_jet(table, base):
        def body(s):
            acc, i = s
            idx = jnp.minimum(base + i * stride // 8, R - 1)
            rows = jnp.take(table, idx, axis=0)
            taps = rows.reshape(n, 4, 4, 4)
            f = (acc % 1.0)[..., None] * 0 + 0.5
            w, dw, ddw = bspline_weights(f[..., 0])
            W = jnp.stack([w, dw, ddw], -1)
            t = jnp.einsum("nzyx,nxi->nzyi", taps, W)
            t = jnp.einsum("nzyi,nyj->nzij", t, W)
            o = jnp.einsum("nzij,nzk->nkji", t, W)
            return acc + o[:, 0, 0, 0] + o[:, 1, 1, 1], i + 1

        return jax.lax.while_loop(
            lambda s: s[1] < K, body, (jnp.zeros((n,), jnp.float32), jnp.int32(0))
        )[0]

    rec(f"inloop_jet_n{n//1000}k", timed(run_jet, table, base) / K, n, "Mrows/iter")


# -------------------------------------------- warp body straight-line cost
def probe_body():
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF, TraceParams
    from differentiable_sdf_rendering_tpu.ops import trace as trace_mod

    grid_res = 32 if SMALL else 64
    n = 4_096 if SMALL else 262_144
    sdf = GridSDF.create(target_sdf("bunny", grid_res)).prepare()
    params = TraceParams()
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), minval=0.1, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # jet + weight + weight_d — the body's compute without loop machinery
    @jax.jit
    def one_iter(sdf, x, d):
        f, g, h = sdf.eval_all(x)
        bbox = sdf.bbox(params.bbox_expand)
        w, w_d = trace_mod._trace_weight(d, jnp.zeros((n,), jnp.int32), bbox, x, f, g, h, params)
        return f + w, g + w_d

    rec(f"warpbody_jet_weight_n{n//1000}k", timed(one_iter, sdf, x, d), n)

    # value-only body (plain trace's per-iteration compute)
    @jax.jit
    def one_iter_val(sdf, x):
        return sdf.eval(x)

    rec(f"plainbody_value_n{n//1000}k", timed(one_iter_val, sdf, x), n)


# ------------------------------------------------- end-to-end trace timings
def probe_trace():
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF, TraceParams
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace, sphere_trace_warp

    grid_res = 32 if SMALL else 64
    res = 64 if SMALL else 256
    spp = 4
    n = res * res * spp
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    pix = jnp.arange(n, dtype=jnp.uint32) // spp
    pos = jnp.stack([(pix % res).astype(jnp.float32) + 0.5,
                     (pix // res).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    sdf = GridSDF.create(target_sdf("bunny", grid_res)).prepare()

    variants = {
        "_warmup": TraceParams(),
        "plain": TraceParams(),
        "plain_c2": TraceParams(compact_stages=(2, 8, 32, 256)),
        "plain_norefine": TraceParams(refine_intersection=False),
        "plain_ms48": TraceParams(max_steps=48),
        "warp": TraceParams(),
        "warp_c2": TraceParams(compact_stages=(2, 8, 32, 256)),
        "warp_ms48": TraceParams(max_steps=48),
    }
    for name, tp in variants.items():
        fn = sphere_trace_warp if name.startswith("warp") else sphere_trace

        @jax.jit
        def run(sdf, o, d, fn=fn, tp=tp):
            r = fn(sdf, o, d, tp)
            return r.warp_t if hasattr(r, "warp_t") else r

        try:
            dt = timed(run, sdf, o, d)
            if name != "_warmup":
                rec(f"trace_{name}_n{n//1000}k", dt, n)
        except Exception as e:  # noqa: BLE001
            fail(f"trace_{name}", e)

    # step-count distribution (drives the stage/iteration budget)
    r = jax.jit(lambda s, o, d: sphere_trace_warp(s, o, d, TraceParams()).num_steps)(sdf, o, d)
    steps = np.asarray(r)
    print(f"  steps: mean {steps.mean():.1f} p50 {np.percentile(steps,50):.0f} "
          f"p90 {np.percentile(steps,90):.0f} p99 {np.percentile(steps,99):.0f} "
          f"max {steps.max()}", flush=True)
    OUT["steps"] = {"mean": float(steps.mean()), "p99": float(np.percentile(steps, 99)),
                    "max": int(steps.max())}


# ------------------------------------------------------- near-sorted gather
def probe_jitter():
    R = 67**3
    n = 8_192 if SMALL else 278_000
    table = jax.random.normal(jax.random.PRNGKey(0), (R, 64), jnp.float32)
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (n,), 0, R, jnp.int32))

    @jax.jit
    def take(table, idx):
        return jnp.take(table, idx, axis=0)

    for k in (0, 4, 64, 1024):
        jit_idx = jnp.clip(
            idx + jax.random.randint(jax.random.PRNGKey(k + 3), (n,), -k, k + 1), 0, R - 1
        )
        rec(f"take_sorted_jitter{k}", timed(take, table, jit_idx), n, "Mrows")


# ------------------------------------------------- pallas fused trace kernel
def probe_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("PROBE_INTERPRET", "0") == "1"
    n = 4_096 if SMALL else 262_144
    SUB = 8 if SMALL else 64  # sublanes per program block
    BLK = SUB * 128           # lanes per program
    K = 64                    # max steps

    # analytic sphere at (0.5,0.5,0.5) r=0.3; rays from a ring
    ang = jnp.arange(n, dtype=jnp.float32) * (6.283 / n)
    o = jnp.stack([0.5 + 2 * jnp.cos(ang), 0.5 + 2 * jnp.sin(ang), jnp.full((n,), 0.5)], 0)
    ctr = jnp.stack([jnp.full((n,), 0.5)] * 3, 0)
    d = ctr - o
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    od = jnp.concatenate([o, d], 0).reshape(6, n // 128, 128)

    def kernel(od_ref, out_ref):
        ox, oy, oz = od_ref[0], od_ref[1], od_ref[2]
        dx, dy, dz = od_ref[3], od_ref[4], od_ref[5]
        t0 = jnp.zeros((SUB, 128), jnp.float32)
        a0 = jnp.ones((SUB, 128), jnp.bool_)

        def body(s):
            t, a, i = s
            x = ox + t * dx - 0.5
            y = oy + t * dy - 0.5
            z = oz + t * dz - 0.5
            f = jnp.sqrt(x * x + y * y + z * z) - 0.3
            hit = f < 1e-5
            t = jnp.where(a & ~hit, t + jnp.abs(f), t)
            a = a & ~hit & (t < 4.0) & (i < K)
            return t, a, i + 1

        t, _, _ = jax.lax.while_loop(
            lambda s: jnp.any(s[1]), body, (t0, a0, jnp.zeros((), jnp.int32))
        )
        out_ref[:] = t

    @jax.jit
    def run(od):
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[pl.BlockSpec((6, SUB, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
            interpret=interp,
        )(od)

    try:
        t = np.asarray(run(od)).reshape(-1)
        # oracle: rays aimed at the center hit at dist - r
        want = np.linalg.norm(np.asarray(o - ctr), axis=0) - 0.3
        err = np.abs(t - want)
        assert np.median(err) < 1e-3, f"median hit-t err {np.median(err)}"
        rec(f"pallas_analytic_trace_n{n//1000}k", timed(run, od), n)
    except Exception as e:  # noqa: BLE001
        fail("pallas_analytic_trace", e)

    # XLA reference of the same workload for a like-for-like ratio
    from differentiable_sdf_rendering_tpu.ops.sdf import SphereSDF, TraceParams
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace

    sph = SphereSDF.create()

    @jax.jit
    def run_xla(o, d):
        return sphere_trace(sph, o.T, d.T, TraceParams(refine_intersection=False))

    try:
        rec(f"xla_analytic_trace_n{n//1000}k", timed(run_xla, o, d), n)
    except Exception as e:  # noqa: BLE001
        fail("xla_analytic_trace", e)


# ------------------------------------- pallas per-lane gather (brick core op)
def probe_pgather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("PROBE_INTERPRET", "0") == "1"
    n = 8_192 if SMALL else 262_144

    for TR in (512, 2048):  # brick sizes: 8³, ~13³
        SUB = 32
        BLK = SUB * 128

        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]                      # (TR, 128) replicated table
            idx = idx_ref[:]                      # (SUB, 128) int32
            out_ref[:] = jnp.take_along_axis(tab, idx, axis=0)

        tab = jax.random.normal(jax.random.PRNGKey(5), (TR,), jnp.float32)
        tab_rep = jnp.broadcast_to(tab[:, None], (TR, 128))
        idx = jax.random.randint(jax.random.PRNGKey(6), (n,), 0, TR, jnp.int32)
        idx2 = idx.reshape(n // 128, 128)

        @jax.jit
        def run(tab_rep, idx2):
            return pl.pallas_call(
                kernel,
                grid=(n // BLK,),
                in_specs=[
                    pl.BlockSpec((TR, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
                interpret=interp,
            )(tab_rep, idx2)

        try:
            got = np.asarray(run(tab_rep, idx2)).reshape(-1)
            want = np.asarray(tab)[np.asarray(idx)]
            np.testing.assert_allclose(got, want, rtol=1e-6)
            rec(f"pallas_tal_gather_TR{TR}", timed(run, tab_rep, idx2), n, "Mrows")
        except Exception as e:  # noqa: BLE001
            fail(f"pallas_tal_gather_TR{TR}", e)


# --------------------------------------------- pallas DMA row gather (retry)
def probe_pdma():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("PROBE_INTERPRET", "0") == "1"
    R = 67**3
    n = 8_192 if SMALL else 262_144
    table = jax.random.normal(jax.random.PRNGKey(0), (R, 64), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, R, jnp.int32)
    DBLK = 512
    SLOTS = 8

    def kernel(idx_ref, tab_hbm, out_ref, scratch, sem):
        def get(b, slot):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[b], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sem.at[slot],
            )

        for s in range(SLOTS):
            get(s, s).start()

        def body(b, _):
            slot = jax.lax.rem(b, SLOTS)
            get(b, slot).wait()
            out_ref[pl.ds(b, 1), :] = scratch[pl.ds(slot, 1), :]

            @pl.when(b + SLOTS < DBLK)
            def _():
                get(b + SLOTS, slot).start()

            return 0

        jax.lax.fori_loop(0, DBLK, body, 0)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            grid=(n // DBLK,),
            in_specs=[
                pl.BlockSpec((DBLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((DBLK, 64), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 64), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((SLOTS, 64), jnp.float32),
                pltpu.SemaphoreType.DMA((SLOTS,)),
            ],
            interpret=interp,
        )(idx, tab)

    try:
        got = np.asarray(run(table, idx))
        np.testing.assert_allclose(got, np.asarray(table)[np.asarray(idx)], rtol=1e-6)
        rec("pallas_dma_rows", timed(run, table, idx), n, "Mrows")
    except Exception as e:  # noqa: BLE001
        fail("pallas_dma_rows", e)


def main():
    print(f"platform={jax.devices()[0].platform} small={SMALL}", flush=True)
    for name, fn in [
        ("loop", probe_loop),
        ("inloop", probe_inloop),
        ("body", probe_body),
        ("trace", probe_trace),
        ("jitter", probe_jitter),
        ("pallas", probe_pallas),
        ("pgather", probe_pgather),
        ("pdma", probe_pdma),
    ]:
        if not want(name):
            continue
        print(f"-- {name}", flush=True)
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            fail(name, e)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
