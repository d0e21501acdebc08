#!/usr/bin/env python3
"""Round-4 device probe: can the B-spline weight construction ride the MXU?

r3 facts (output/device_r3/probe1.log + BASELINE.md):
  * full-width trace-body cost at 262 k lanes: value body 8.7 ms/iter,
    full jet body 19.5 ms/iter — vs a 3.2 ms gather and a ~0.1 ms
    bandwidth bound, i.e. the WEIGHT CONSTRUCTION + contraction dominates;
  * einsum/dot per-lane 4-wide contractions are 100× below the VPU
    (ops/grid._jet_contract docstring) — but that verdict covered tiny
    BATCHED dots, not one large (N, 64) @ (64, 64·k) constant matmul.

This probe times the candidate reformulation: every weight table
w_o[k] = wz(fz)·wy(fy)·wx(fx) is a LINEAR function of the 64 trilinear
monomials  mono[m] = fz^a·fy^b·fx^c  (a,b,c ≤ 3), so ALL orders' weights
are ONE constant matmul  W = mono @ M_allᵀ  with M_all = ⊕_o Bz_o⊗By_o⊗Bx_o
precomputed — MXU work instead of 10 broadcast-product passes.

Variants (N = 262144 queries on a 128³ grid unless PROBE_N=small):
  gather_only      stencil-row fetch + reduce (the irreducible gather)
  mono_only        monomial construction (..., 64) alone
  weights10_cur    the CURRENT 10-order broadcast weight build (no gather)
  value_cur        grid_eval as shipped
  value_mm         matmul weights, value only
  jet_cur          grid_eval_all as shipped
  jet_mm           matmul weights, all 10 orders (HIGHEST precision)
  jet_mm_bf16w     same with default (bf16) matmul — precision floor check
  loop8_value_cur  8-iteration fori loop of value evals (in-loop fusion)
  loop8_value_mm   same with the matmul formulation
  loop8_jet_cur    8-iteration fori loop of full-jet evals
  loop8_jet_mm     same with the matmul formulation
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
import numpy as np

enable_compile_cache()

from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF
from differentiable_sdf_rendering_tpu.ops import grid as gridops

REPS = int(os.environ.get("PROBE_REPS", "8"))
SMALL = os.environ.get("PROBE_N") == "small"
OUT = {}

# ---- constant matrices ----------------------------------------------------
# cubic B-spline basis coefficients: w_i(f) = sum_a B[i, a] f^a
_B = np.array(
    [[1, -3, 3, -1], [4, 0, -6, 3], [1, 3, 3, -3], [0, 0, 0, 1]], np.float64
) / 6.0


def _deriv(Bm):
    out = np.zeros_like(Bm)
    for a in range(1, 4):
        out[:, a - 1] = Bm[:, a] * a
    return out


_DB = _deriv(_B)
_DDB = _deriv(_DB)
_BASIS = (_B, _DB, _DDB)

_ORDERS_JET = [
    (0, 0, 0),
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 0), (1, 0, 1), (0, 1, 1),
]


def _order_matrix(ox, oy, oz):
    # M[k, m]: k = (iz*4+iy)*4+ix tap index, m = (a*4+b)*4+c monomial
    # index with mono[m] = fz^a fy^b fx^c
    return np.kron(_BASIS[oz], np.kron(_BASIS[oy], _BASIS[ox]))


def order_stack(orders):
    return jnp.asarray(
        np.concatenate([_order_matrix(*o) for o in orders], axis=0), jnp.float32
    )  # (64*n_orders, 64)


def monomials(f):
    """(..., 3) fractions -> (..., 64) monomials fz^a fy^b fx^c."""
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def pows(t):
        t2 = t * t
        return jnp.stack([jnp.ones_like(t), t, t2, t2 * t], axis=-1)

    px, py, pz = pows(fx), pows(fy), pows(fz)
    mono = (
        pz[..., :, None, None] * py[..., None, :, None] * px[..., None, None, :]
    )
    return mono.reshape(mono.shape[:-3] + (64,))


def eval_mm(data, p, stencil, M_T, n_orders, precision):
    """Matmul-weight evaluation: list of n_orders (...,) outputs."""
    taps, f, res = gridops._tap_setup(data, p, stencil)
    taps64 = taps.reshape(taps.shape[:-3] + (64,))
    mono = monomials(f)
    W = jnp.matmul(mono, M_T, precision=precision)  # (..., 64*n_orders)
    outs = [
        jnp.sum(taps64 * W[..., o * 64:(o + 1) * 64], axis=-1)
        for o in range(n_orders)
    ]
    return outs, res


def main():
    n = 65536 if SMALL else 262144
    grid_res = 32 if SMALL else int(os.environ.get("PROBE_GRID", "128"))
    sdf = GridSDF.create(target_sdf("bunny", grid_res)).prepare()
    data, stencil = sdf.data, sdf.stencil

    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, (n, 3), jnp.float32, 0.02, 0.98)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    M1_T = order_stack([(0, 0, 0)]).T          # (64, 64)
    M10_T = order_stack(_ORDERS_JET).T         # (64, 640)
    HIGH = jax.lax.Precision.HIGHEST

    def sync(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    def timed(f, *args):
        sync(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(REPS)]
        sync(sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0] for r in outs))
        return (time.perf_counter() - t0) / REPS

    def record(name, dt):
        OUT[name] = {"ms": round(dt * 1e3, 3), "Mlanes_per_s": round(n / dt / 1e6, 2)}
        print(f"  {name:24s} {dt*1e3:9.3f} ms  {n/dt/1e6:8.2f} Mlanes/s", flush=True)

    print(f"platform={jax.devices()[0].platform} n={n} grid={grid_res}", flush=True)

    # correctness cross-check first (device values, loose fp32 tolerance)
    v_cur = jax.jit(lambda d_, p_, s_: gridops.grid_eval(d_, p_, s_))(data, p, stencil)
    (v_mm_l, _) = jax.jit(
        lambda d_, p_, s_: eval_mm(d_, p_, s_, M1_T, 1, HIGH)
    )(data, p, stencil)
    v_mm = v_mm_l[0]
    err = float(jnp.max(jnp.abs(v_cur - v_mm)))
    jc = jax.jit(lambda d_, p_, s_: gridops.grid_eval_all(d_, p_, s_))(data, p, stencil)
    (jm_l, _) = jax.jit(
        lambda d_, p_, s_: eval_mm(d_, p_, s_, M10_T, 10, HIGH)
    )(data, p, stencil)
    gerr = float(jnp.max(jnp.abs(jc[1][..., 0] / 1.0 - jm_l[1] * grid_res)))
    herr = float(jnp.max(jnp.abs(jc[2][..., 0, 0] - jm_l[4] * grid_res * grid_res)))
    (jm_bf_l, _) = jax.jit(
        lambda d_, p_, s_: eval_mm(d_, p_, s_, M10_T, 10, jax.lax.Precision.DEFAULT)
    )(data, p, stencil)
    bf_err = float(jnp.max(jnp.abs(jm_bf_l[0] - v_cur)))
    print(f"  value err HIGHEST={err:.3e}  grad err={gerr:.3e}  hess err={herr:.3e}  "
          f"value err DEFAULT-prec={bf_err:.3e}", flush=True)
    OUT["errors"] = {"value_high": err, "grad_high": gerr, "hess_high": herr,
                     "value_default": bf_err}

    # ---- straight-line bodies ----
    record("gather_only", timed(
        jax.jit(lambda s_, p_: jnp.sum(
            gridops._tap_setup(data, p_, s_)[0].reshape(n, 64), axis=-1)), stencil, p))
    record("mono_only", timed(jax.jit(
        lambda p_: monomials(p_ * grid_res - jnp.floor(p_ * grid_res))), p))

    def weights10_cur(p_):
        c = p_ * grid_res - 0.5
        f = c - jnp.floor(c)
        wx, dwx, ddwx = gridops.bspline_weights(f[..., 0])
        wy, dwy, ddwy = gridops.bspline_weights(f[..., 1])
        wz, dwz, ddwz = gridops.bspline_weights(f[..., 2])
        wxs, wys, wzs = (wx, dwx, ddwx), (wy, dwy, ddwy), (wz, dwz, ddwz)
        acc = 0.0
        for ox, oy, oz in _ORDERS_JET:
            w = (wzs[oz][..., :, None, None] * wys[oy][..., None, :, None]
                 * wxs[ox][..., None, None, :]).reshape(p_.shape[:-1] + (64,))
            acc = acc + jnp.sum(w, axis=-1)
        return acc

    record("weights10_cur", timed(jax.jit(weights10_cur), p))
    record("value_cur", timed(
        jax.jit(lambda d_, p_, s_: gridops.grid_eval(d_, p_, s_)), data, p, stencil))
    record("value_mm", timed(
        jax.jit(lambda d_, p_, s_: eval_mm(d_, p_, s_, M1_T, 1, HIGH)[0][0]),
        data, p, stencil))
    record("jet_cur", timed(
        jax.jit(lambda d_, p_, s_: gridops.grid_eval_all(d_, p_, s_)[2]),
        data, p, stencil))
    record("jet_mm", timed(
        jax.jit(lambda d_, p_, s_: sum(eval_mm(d_, p_, s_, M10_T, 10, HIGH)[0])),
        data, p, stencil))
    record("jet_mm_bf16w", timed(
        jax.jit(lambda d_, p_, s_: sum(
            eval_mm(d_, p_, s_, M10_T, 10, jax.lax.Precision.DEFAULT)[0])),
        data, p, stencil))

    # ---- trace-like loops: 8 fori iterations, point advances by the value ----
    def loop(body):
        def f(d_, p_, s_):
            def it(i, carry):
                pt, acc = carry
                v = body(d_, pt, s_)
                return (pt + 0.01 * v[..., None] * d, acc + v)
            return jax.lax.fori_loop(0, 8, it, (p_, jnp.zeros(p_.shape[:-1])))[1]
        return f

    record("loop8_value_cur", timed(jax.jit(loop(
        lambda d_, pt, s_: gridops.grid_eval(d_, pt, s_))), data, p, stencil))
    record("loop8_value_mm", timed(jax.jit(loop(
        lambda d_, pt, s_: eval_mm(d_, pt, s_, M1_T, 1, HIGH)[0][0])), data, p, stencil))
    record("loop8_jet_cur", timed(jax.jit(loop(
        lambda d_, pt, s_: sum(
            [gridops.grid_eval_all(d_, pt, s_)[0],
             gridops.grid_eval_all(d_, pt, s_)[2][..., 0, 0]]))), data, p, stencil))

    def jet_mm_body(d_, pt, s_):
        outs, _ = eval_mm(d_, pt, s_, M10_T, 10, HIGH)
        return outs[0] + outs[4]

    record("loop8_jet_mm", timed(jax.jit(loop(jet_mm_body)), data, p, stencil))

    print(json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
