"""Sphere tracing against SDFs, with in-loop warp-field accumulators.

TPU-native re-design of the reference's differential sphere tracer
(``/root/reference/python/shapes.py:115-339``): the Dr.Jit recorded wavefront
loop becomes a ``jax.lax.while_loop`` over a batch of rays with per-lane
``active`` masks; all state is a flat dict of (N,)/(N,3) arrays so the loop
jits into one fused XLA computation (or a Pallas kernel, see
``ops/pallas_trace``).

Two entry points:

* ``sphere_trace``     — plain intersection (primal rendering fast path;
  reference ``ray_intersect_non_diff``, shapes.py:290-339).
* ``sphere_trace_warp`` — intersection + the paper's weighted warp-field
  accumulators computed *during* the trace (reference ``ray_intersect``,
  shapes.py:115-288): the weighted mean depth ``warp_t = Σ w·t·Δ / Σ w·Δ``
  (trapezoid rule over trace segments), its hand-derived derivative
  ``warp_t_d = ∂warp_t/∂(ray direction)``, and the clamped weight-sum warp
  multiplier.  Everything here is *detached*: gradients are attached later by
  the warp field (``ops/warp.py``) evaluated at ``x = ray(warp_t)``, exactly
  mirroring the reference's detached-trace/attached-warp split
  (warp.py:104-115).

The per-step silhouette weight is ``w = 1/(ε + |f| + c·(n·d)²/|n|²)^p`` with
bounding-box down-weighting, and an analytic spatial weight gradient that
uses the SDF Hessian (reference ``eval_trace_weight``, shapes.py:68-113).
Derivatives w.r.t. the ray direction are converted from spatial gradients via
``∇_d g = t·∇_x g + (d·∇_x g)·t_d`` (shapes.py:126-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .sdf import GridSDF, TraceParams
from .vecmath import bbox_distance_inside_d, dot, nearest_axis_mask, normalize, ray_bbox_intersect

__all__ = ["TraceResult", "sphere_trace", "sphere_trace_warp"]

_INF = jnp.inf


def _fast_sdf(sdf):
    """Detached, stencil-prepared SDF for the trace loop.

    The loop body's dominant cost on TPU is the interpolation gather;
    preparing the contiguous-row stencil table (ops/grid.build_stencil)
    outside the ``while_loop`` makes every in-loop eval one gather row per
    lane (~11× measured).  Attached evaluations (warp field, surface
    interaction) keep the plain per-tap path so the backward pass
    scatter-adds into the grid, not into the 64× stencil table.
    """
    sdf = jax.lax.stop_gradient(sdf)
    if isinstance(sdf, GridSDF) and sdf.stencil is None:
        sdf = sdf.prepare()  # no-op for grids too large for the table
    return sdf


@struct.dataclass
class TraceResult:
    """Output of a (warp-)sphere-trace; all leaves detached, shape (N,) / (N,3)."""

    its_t: jnp.ndarray          # intersection distance, inf if none
    warp_t: jnp.ndarray         # weighted mean free-flight distance, inf if invalid
    warp_t_d: jnp.ndarray       # ∂warp_t/∂d (3,)
    warp_weight: jnp.ndarray    # clamped weight-sum warp multiplier in [0,1]
    warp_weight_d: jnp.ndarray  # ∂warp_weight/∂d (3,)
    num_steps: jnp.ndarray      # trace iterations used (int32)
    weight_sum: jnp.ndarray     # raw accumulated weight (debug AOV)

    @property
    def valid(self):
        return jnp.isfinite(self.its_t)


# Refine-loop structure (module knobs so device probes can bisect them —
# scripts/refine_bisect_r5.py; the defaults are the r3-measured optimum)
_REFINE_STAGES = (2, 8, 64)
_REFINE_UNROLL = 5
_REFINE_UNROLL_NEWTON = 2


def _staged_while(body, state, consts, stages=(8, 64), unroll=1, depth=0):
    """``while_loop(any(active), body)`` with active-lane compaction.

    Sphere-trace trip counts are extremely skewed (measured on bunny 64³:
    mean 4 steps, p99 24, worst lane 192) — a lockstep wavefront loop pays a
    full-batch SDF evaluation for every iteration of the WORST lane.  This
    runs the loop in stages: full batch until ≤ N/8 lanes remain active,
    then gathers the stragglers into an N/8 buffer and continues, then N/64.
    Pure lane reordering — each lane computes bit-identical values to the
    plain loop.

    ``body(state, consts) -> state``: ``state`` is a dict of (N,)/(N,3)
    leaves incl. boolean ``active``; ``consts`` is a dict of per-lane
    read-only leaves (origins, directions, per-lane maxt, ...).  Lanes
    beyond a stage buffer never exist: the gather pads with inactive
    dummies (fill) and the scatter back drops them.

    ``depth`` tracks the compaction level and escalates the unroll factor
    (×2 per stage, capped at 8): every while/fori iteration costs a fixed
    ~0.2 ms on this runtime regardless of width (trace_probe_r3 'loop'),
    so the straggler TAIL — few lanes, many iterations — is iteration-
    count-bound while its masked body evaluations are nearly free.  Tail
    unrolling trades ≤(unroll−1) wasted evals per lane for unroll× fewer
    iterations; body updates are active-masked so its_t/warp_t/weight_sum
    are bit-identical (derivative accumulators match to FMA-reassociation
    level, see TraceParams.unroll).
    """
    n = state["active"].shape[-1]
    unroll_eff = min(max(unroll, 1 << depth), 8)

    def run(state, consts, stop_count):
        def cond(s):
            alive = jnp.sum(s["active"], axis=-1)
            return jnp.any(alive > stop_count)

        def body_u(s):
            for _ in range(unroll_eff):
                s = body(s, consts)
            return s

        return jax.lax.while_loop(cond, body_u, state)

    def take(a, idx):
        fill = False if a.dtype == jnp.bool_ else 0
        return jnp.take(a, idx, axis=0, mode="fill", fill_value=fill)

    batched = state["active"].ndim > 1  # vmapped callers: no compaction
    if batched:
        return run(state, consts, 0)

    for ratio in stages:
        m = n // ratio
        if m < 256:  # not worth the bookkeeping
            break
        state = run(state, consts, m)
        idx = jnp.flatnonzero(state["active"], size=m, fill_value=n)
        sub_state = jax.tree_util.tree_map(lambda a: take(a, idx), state)
        sub_consts = jax.tree_util.tree_map(lambda a: take(a, idx), consts)
        sub_state = _staged_while(
            body, sub_state, sub_consts,
            stages=tuple(r // ratio for r in stages if r > ratio),
            unroll=unroll, depth=depth + 1,
        )
        state = jax.tree_util.tree_map(
            lambda full, sub: full.at[idx].set(sub, mode="drop"), state, sub_state
        )
        return state
    return run(state, consts, 0)


def _ray_setup(sdf, o, d, params: TraceParams, maxt):
    """Shared entry logic: normalize, clip to the (expanded) SDF bbox.

    Mirrors shapes.py:129-141 — rays starting inside the box begin at t=0,
    outside rays at the box entry + 1e-5; the trace tolerance scales with
    ray extent: ``trace_eps * max(maxt, 1)``.
    """
    d = normalize(d)
    bmin, bmax = sdf.bbox(params.bbox_expand)
    hit, mint, tmax = ray_bbox_intersect(o, d, bmin, bmax)
    inside = jnp.all((o >= bmin) & (o <= bmax), axis=-1)
    # honor the caller's ray extent: the box must be entered within it
    # (mi.BoundingBox3f.ray_intersect checks mint <= ray.maxt)
    hit = hit & ((mint > 0) | inside) & (mint <= maxt)
    maxt = jnp.minimum(tmax, maxt)
    trace_eps = params.trace_eps * jnp.maximum(maxt, 1.0)
    # Non-hitting lanes never trace; pin them to t=0 so their (unused)
    # position evaluations stay finite.
    t0 = jnp.where(hit, jnp.where(inside, 0.0, mint + 1e-5), 0.0)
    return d, (bmin, bmax), hit, inside, t0, maxt, trace_eps


def sphere_trace(sdf, o, d, params: TraceParams = TraceParams(), maxt=_INF, active=True,
                 refine_active=True):
    """Non-differential sphere trace → intersection distance (N,), inf = miss.

    Reference ``ray_intersect_non_diff`` (shapes.py:290-339) including the
    10-step decreasing-rate refinement loop.  ``refine_active`` masks the
    refinement per lane (False = occlusion-only lanes whose ``isfinite`` bit
    is invariant under refinement) — lets one merged trace carry shadow and
    scattering rays together without paying refinement on the former.
    """
    sdf = _fast_sdf(sdf)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    maxt = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), o.shape[:-1])
    d, _, hit, _, t0, maxt, trace_eps = _ray_setup(sdf, o, d, params, maxt)
    active0 = jnp.broadcast_to(jnp.asarray(active, bool), t0.shape) & hit

    scale = params.step_scale
    relax = params.over_relax
    # The retreat formula (1-ω)·step is a sound recovery only for ω ∈ [1, 2);
    # and the hit test may land inside the surface under over-relaxation, so
    # the refinement pass is mandatory (it converges its_t to the ±ε shell).
    assert 1.0 <= relax < 2.0, f"over_relax must be in [1, 2), got {relax}"
    if relax > 1.0:
        assert params.refine_intersection, "over_relax requires refine_intersection"

    def body(s, c):
        act, t, its_t, i = s["active"], s["t"], s["its_t"], s["i"]
        o, d, maxt, trace_eps = c["o"], c["d"], c["maxt"], c["trace_eps"]
        x = o + t[..., None] * d
        f = sdf.eval(x) * scale
        if relax > 1.0:
            # Over-relaxed sphere tracing (Keinert et al. 2014): step ω·|f|;
            # when consecutive unbounding spheres stop overlapping, the ω
            # step overshot — retreat by (ω−1)·step and drop to ω=1 for the
            # rest of the ray.  One SDF eval per iteration, like the plain
            # trace; typical step-count savings ~25%.  An ω step may land
            # slightly inside the surface (f < 0 passes the hit test); the
            # mandatory refinement pass (asserted in sphere_trace) converges
            # its_t back to the |f| < ε shell.
            radius = jnp.abs(f)
            omega = s["omega"]
            fail = (omega > 1.0) & (radius + s["prev_radius"] < s["step_len"])
            intersected = ~fail & (f < trace_eps)
            its_t = jnp.where(act & intersected, t, its_t)
            step = jnp.where(fail, (1.0 - relax) * s["step_len"], radius * omega)
            step = jnp.where(intersected, 0.0, step)
            t_new = jnp.where(act, t + step, t)
            # Termination must use the CONSERVATIVE reach t + |f| (the
            # unbounding-sphere bound), not the ω-inflated t_new: only
            # t + |f| > maxt proves the remaining interval is empty — and a
            # fail/retreat iteration must never terminate (the uncovered gap
            # behind the overshoot may contain a surface before maxt).
            act = act & (fail | (t + radius <= maxt)) & ~intersected & (i + 1 < params.max_steps)
            return {
                "active": act, "t": t_new, "its_t": its_t, "i": i + 1,
                "omega": jnp.where(fail, 1.0, omega),
                "prev_radius": jnp.where(fail, 0.0, radius),
                "step_len": jnp.abs(step),
            }
        intersected = f < trace_eps
        its_t = jnp.where(act & intersected, t, its_t)
        step = jnp.where(intersected, 0.0, jnp.abs(f))
        t_new = jnp.where(act, t + step, t)
        act = act & (t_new <= maxt) & ~intersected & (i + 1 < params.max_steps)
        return {"active": act, "t": t_new, "its_t": its_t, "i": i + 1}

    state = {
        "active": active0,
        "t": t0,
        "its_t": jnp.full_like(t0, _INF),
        "i": jnp.zeros_like(t0, jnp.int32),
    }
    if relax > 1.0:
        state["omega"] = jnp.full_like(t0, relax)
        state["prev_radius"] = jnp.zeros_like(t0)
        state["step_len"] = jnp.zeros_like(t0)
    consts = {"o": o, "d": d, "maxt": maxt, "trace_eps": trace_eps}
    its_t = _staged_while(body, state, consts, params.compact_stages,
                          unroll=params.unroll)["its_t"]

    if params.refine_intersection:
        its_t = _refine(sdf, o, d, its_t, trace_eps, params, refine_active)
    return its_t


def _refine(sdf, o, d, its_t, trace_eps, params: TraceParams, refine_active=True):
    """Intersection refinement into the (0, ε] shell.

    Two interchangeable root polishers behind ``params.refine`` (both stop
    at the SAME acceptance band as the reference — ``0 < f ≤ ε`` — so
    downstream consumers see the same contract; only the within-band
    placement differs by O(ε)):

    * ``'fixed'`` — the reference's decreasing-rate iteration
      ``t += f·10/(10+i)`` (shapes.py:244-257), bit-faithful.
    * ``'newton'`` — guarded Newton toward the band center ε/2:
      ``t += (f − ε/2)·rate`` with ``rate = min(−1/(d·∇f), 4)`` where the
      slope is usefully negative, else the fixed-rate fallback.  Converges
      in ~2 evaluations instead of ~10 — the refine pass was a measured
      26% of a full 262 k-lane trace on v5e (r4 sweep) because the
      decreasing-rate update creeps into the band slowly.  The gradient
      evaluation shares the tap gather, so a Newton step costs the same
      HBM traffic as a value-only step.

    Runs as a compacted while_loop rather than a full-width ``fori_loop``:
    only hit lanes (typically ~30% of the wavefront) refine, and a lane stops
    once it converges into the shell — the full-width loop paid its grid
    evaluations for EVERY lane (miss lanes included, evaluated at t=inf).
    Per-lane trajectories are deterministic: every lane starts at iteration 0
    and refines contiguously, so its private step counter ``i`` equals the
    original loop index for as long as it refines.
    """
    newton = params.refine == "newton"

    def body(s, c):
        refining, t, i = s["active"], s["t"], s["i"]
        x = c["o"] + t[..., None] * c["d"]
        if newton:
            f, g = sdf.eval_and_grad(x)
            f = f * params.step_scale
            slope = dot(g, c["d"]) * params.step_scale
            rate_fb = 10.0 / (10.0 + i)
            rate = jnp.where(slope < -0.25, jnp.minimum(-1.0 / slope, 4.0), rate_fb)
            step = (f - 0.5 * c["trace_eps"]) * rate
        else:
            f = sdf.eval(x) * params.step_scale
            step = f * (10.0 / (10.0 + i))
        t_new = jnp.where(refining, t + step, t)
        refining = refining & ((f <= 0) | (f > c["trace_eps"])) & (i + 1 < params.refine_steps)
        return {"active": refining, "t": t_new, "i": i + 1}

    refining0 = jnp.isfinite(its_t) & (params.refine_steps > 0) & refine_active
    state = {
        "active": refining0,
        "t": jnp.where(refining0, its_t, 0.0),
        "i": jnp.zeros_like(its_t, jnp.int32),
    }
    consts = {
        "o": o,
        "d": d,
        "trace_eps": jnp.broadcast_to(trace_eps, its_t.shape),
    }
    # Most lanes are inactive from iteration 0, so compaction kicks in
    # immediately at the n/2 stage (the full-width loop exits its first
    # cond).  unroll: fixed-rate lanes mostly run all `refine_steps`
    # iterations (unroll 5 cut the measured refine share of a plain 262k
    # trace from 21 ms to ~a third, r3 device sweep); Newton lanes converge
    # in ~2, so deeper unrolling only wastes masked evals.  Masked body ⇒
    # deterministic refined t either way.
    s = _staged_while(body, state, consts, stages=_REFINE_STAGES,
                      unroll=_REFINE_UNROLL_NEWTON if newton else _REFINE_UNROLL)
    return jnp.where(refining0, s["t"], its_t)


def _trace_weight(d, i, bbox, x, f, g, h, params: TraceParams):
    """Per-step silhouette weight + its spatial gradient (shapes.py:68-113).

    ``w = bbox_w / (ε_sil + |f| + c·(n·d)²/|n|²)^p`` with the analytic
    gradient using the Hessian ``h``; the bbox factor ramps the weight to
    zero within 0.01 of the (expanded) bounding box for steps i>0.
    """
    bmin, bmax = bbox
    n_dot_d = dot(g, d)
    n_dot_n = jnp.maximum(dot(g, g), 1e-20)
    dot_ratio = n_dot_d / n_dot_n
    denom = params.sil_weight_epsilon + jnp.abs(f) + params.sil_weight_offset * n_dot_d * dot_ratio
    dist_weight = denom ** (-params.weight_power)

    bbox_dist, bbox_dist_d = bbox_distance_inside_d(x, bmin, bmax)
    bbox_eps = 0.01
    first = i == 0
    bbox_weight = jnp.where(first, 1.0, jnp.minimum(bbox_dist, bbox_eps) / bbox_eps)
    weight = dist_weight * bbox_weight

    bbox_weight_d = jnp.where(
        (~first & (bbox_dist < bbox_eps))[..., None], bbox_dist_d / bbox_eps, 0.0
    )
    # ∇(n·d)²/|n|² = 2·r·(d − r·n) with r = (n·d)/|n|², then chain through H
    gradient = 2.0 * dot_ratio[..., None] * (d - dot_ratio[..., None] * g)
    # per-lane 3-vector · 3×3 as broadcast-multiply-reduce: einsum lowers to
    # a padded batched dot_general ~100× below the VPU (see ops/grid.py
    # _jet_contract) — this runs EVERY warp-trace step
    denom_d = jnp.sign(f)[..., None] * g + params.sil_weight_offset * jnp.sum(
        gradient[..., :, None] * h, axis=-2
    )
    dist_weight_d = (-params.weight_power * dist_weight / denom)[..., None] * denom_d
    weight_d = dist_weight[..., None] * bbox_weight_d + bbox_weight[..., None] * dist_weight_d
    return weight, weight_d


def sphere_trace_warp(
    sdf, o, d, params: TraceParams = TraceParams(), maxt=_INF, active=True,
    refine_active=True,
) -> TraceResult:
    """Differential sphere trace with warp-field accumulators (shapes.py:115-288).

    Returns a fully detached :class:`TraceResult`; NaN-free for inactive and
    missed lanes (``warp_t = inf``, derivative terms zero, as the reference's
    ``invalid`` handling at shapes.py:277-283).
    """
    sdf = _fast_sdf(sdf)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    maxt = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), o.shape[:-1])
    d, bbox, hit, inside, t0, maxt, trace_eps = _ray_setup(sdf, o, d, params, maxt)
    bmin, bmax = bbox
    active0 = jnp.broadcast_to(jnp.asarray(active, bool), t0.shape) & hit

    # Initial dt/dd: entry point slides along the nearest bbox face as d
    # rotates (shapes.py:155-164); zero for rays starting inside.
    x0 = o + t0[..., None] * d
    min_dist = jnp.minimum(jnp.abs(bmin - x0), jnp.abs(bmax - x0))
    n_face = nearest_axis_mask(min_dist)
    d_dot_n = dot(d, n_face)
    ok_dn = jnp.abs(d_dot_n) > 1e-12
    safe_dn = jnp.where(ok_dn, d_dot_n, 1.0)
    t_d0 = jnp.where(
        (~inside & ok_dn)[..., None],
        -n_face / safe_dn[..., None] * t0[..., None],
        0.0,
    )

    scale = params.step_scale
    use_extra = params.use_extra_weight
    zero3 = jnp.zeros_like(d)

    def convert_deriv(in_d, t, t_d, d):
        # spatial gradient → gradient w.r.t. ray direction (shapes.py:126-127)
        return t[..., None] * in_d + dot(d, in_d)[..., None] * t_d

    def body(s, c):
        o, d, maxt, trace_eps = c["o"], c["d"], c["maxt"], c["trace_eps"]
        act = s["active"]
        act3 = act[..., None]
        t = s["t"]
        x = o + t[..., None] * d
        f, g, h = sdf.eval_all(x)
        f, g, h = f * scale, g * scale, h * scale

        intersected = f < trace_eps
        its_t = jnp.where(act & intersected, t, s["its_t"])
        surf_dist = jnp.abs(f)
        weight, weight_d = _trace_weight(d, s["i"], bbox, x, f, g, h, params)

        prev_surf_dist = s["prev_surf_dist"]
        if use_extra:
            # "approach" weight: ramps in as a new surface is approached
            # (shapes.py:195-228)
            inv_ew_den = 1.0 / jnp.maximum(jnp.minimum(params.extra_thresh, surf_dist), 1e-12)
            dist_difference = prev_surf_dist - surf_dist
            ew_sum = s["extra_weight_sum"] + jnp.where(
                dist_difference >= 0, dist_difference * inv_ew_den, 0.0
            )
            ew_sum = jnp.minimum(ew_sum, 1.0)
        else:
            ew_sum = jnp.ones_like(t)

        curr_segment_value = jnp.where(intersected, 0.0, surf_dist)
        segment_length = 0.5 * (curr_segment_value + prev_surf_dist)
        weight_increment = segment_length * weight
        if use_extra:
            weight_increment = weight_increment * ew_sum
        weight_sum = s["weight_sum"] + jnp.where(act, weight_increment, 0.0)
        warp_t = s["warp_t"] + jnp.where(act, weight_increment * t, 0.0)

        t_d = s["t_d"]
        weight_d = convert_deriv(weight_d, t, t_d, d)
        sdf_grad_c = convert_deriv(g, t, t_d, d)
        segment_d = 0.5 * (sdf_grad_c + s["prev_sdf_grad_c"])

        if use_extra:
            surf_dist_d = jnp.sign(f)[..., None] * sdf_grad_c
            extra_w_d = (s["prev_sdf_grad_c"] - surf_dist_d) * inv_ew_den[..., None]
            extra_w_d = extra_w_d - (dist_difference * inv_ew_den * inv_ew_den)[
                ..., None
            ] * jnp.where((f < params.extra_thresh)[..., None], surf_dist_d, 0.0)
            ew_sum_d = s["extra_weight_sum_d"] + jnp.where(
                (dist_difference > 0.0)[..., None], extra_w_d, 0.0
            )
            ew_sum_d = jnp.where(((ew_sum >= 1.0) | (ew_sum <= 0.0))[..., None], 0.0, ew_sum_d)
            weight_d = weight[..., None] * ew_sum_d + weight_d * ew_sum[..., None]
            weight = weight * ew_sum
        else:
            ew_sum_d = jnp.zeros_like(s["t_d"])

        weight_increment_d = weight[..., None] * segment_d + weight_d * segment_length[..., None]
        mixed_sum_d = s["mixed_sum_d"] + jnp.where(
            act3,
            weight_increment_d * t[..., None] + (weight * segment_length)[..., None] * t_d,
            0.0,
        )
        t_d_new = jnp.where(act3, t_d + sdf_grad_c, t_d)
        weight_d_sum = s["weight_d_sum"] + jnp.where(act3, weight_increment_d, 0.0)
        t_new = jnp.where(act, t + curr_segment_value, t)
        i_new = s["i"] + act.astype(jnp.int32)
        act_new = act & (t_new <= maxt) & ~intersected & (i_new < params.max_steps)

        out = {
            "active": act_new,
            "t": t_new,
            "its_t": its_t,
            "prev_surf_dist": jnp.where(act, surf_dist, prev_surf_dist),
            "prev_sdf_grad_c": jnp.where(act3, sdf_grad_c, s["prev_sdf_grad_c"]),
            "t_d": t_d_new,
            "weight_sum": weight_sum,
            "weight_d_sum": weight_d_sum,
            "mixed_sum_d": mixed_sum_d,
            "warp_t": warp_t,
            "i": i_new,
            "extra_weight_sum": jnp.where(act, ew_sum, s["extra_weight_sum"]),
            "extra_weight_sum_d": jnp.where(act3, ew_sum_d, s["extra_weight_sum_d"]),
        }
        return out

    state = {
        "active": active0,
        "t": t0,
        "its_t": jnp.full_like(t0, _INF),
        "prev_surf_dist": jnp.zeros_like(t0),
        "prev_sdf_grad_c": zero3,
        "t_d": t_d0,
        "weight_sum": jnp.zeros_like(t0),
        "weight_d_sum": zero3,
        "mixed_sum_d": zero3,
        "warp_t": jnp.zeros_like(t0),
        "i": jnp.zeros_like(t0, jnp.int32),
        "extra_weight_sum": jnp.zeros_like(t0),
        "extra_weight_sum_d": zero3,
    }
    # Active-lane compaction (same staging as the non-diff trace): trip
    # counts are heavily skewed, and a full-width while_loop makes the whole
    # batch pay for the worst lane — measured 13× slower at 17 k lanes and
    # *superlinear* in batch size (the straggler tail grows with n).  Pure
    # lane reordering: per-lane values are bit-identical.
    consts = {"o": o, "d": d, "maxt": maxt, "trace_eps": trace_eps}
    s = _staged_while(body, state, consts, params.compact_stages,
                      unroll=params.unroll)

    its_t = s["its_t"]
    if params.refine_intersection:
        its_t = _refine(sdf, o, d, its_t, trace_eps, params, refine_active)

    # Normalize the trapezoid accumulators (shapes.py:259-261)
    weight_sum = s["weight_sum"]
    inv_ws = 1.0 / jnp.maximum(weight_sum, 1e-20)
    warp_t = s["warp_t"] * inv_ws
    warp_t_d = (-warp_t[..., None] * s["weight_d_sum"] + s["mixed_sum_d"]) * inv_ws[..., None]

    if params.use_weight_sum_weight:
        warp_weight = jnp.clip(weight_sum, 0.0, 1.0)
        warp_weight_d = jnp.where(
            ((weight_sum > 0.0) & (weight_sum < 1.0))[..., None], s["weight_d_sum"], 0.0
        )
    else:
        warp_weight = jnp.ones_like(weight_sum)
        warp_weight_d = zero3

    # Disable the warp field below a weight threshold / outside the bbox
    # (shapes.py:277-283)
    invalid = (weight_sum < 1e-7) | ~hit
    warp_t = jnp.where(invalid, _INF, warp_t)
    warp_t_d = jnp.where(invalid[..., None], 0.0, warp_t_d)
    warp_weight = jnp.where(invalid, 0.0, warp_weight)
    warp_weight_d = jnp.where(invalid[..., None], 0.0, warp_weight_d)

    return TraceResult(
        its_t=its_t,
        warp_t=warp_t,
        warp_t_d=warp_t_d,
        warp_weight=warp_weight,
        warp_weight_d=warp_weight_d,
        num_steps=s["i"],
        weight_sum=weight_sum,
    )
