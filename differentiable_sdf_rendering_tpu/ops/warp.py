"""Warp-field reparameterization of ray directions (the paper's core).

TPU-native re-design of the reference's ``WarpField2D``
(``/root/reference/python/warp.py:7-128``): the trace is fully detached
(``ops/trace.py``); this module attaches gradients by evaluating the warp
vector field at the weighted mean free-flight point ``x = ray(warp_t)``:

    V(x) = -f(x) · n̂(x) · w(x),   n̂ = ∇f_detached / |∇f_detached|²

with analytic spatial Jacobian and divergence.  The reparameterized ray
direction is ``replace_grad(d, normalize(d·max(c, t) + V − detach(V)))`` and
the change-of-variables determinant is ``replace_grad(1, div)`` where ``div``
is the trace of the Jacobian projected to the unit sphere, including the
dependence of ``x`` on ``d`` through ``warp_t`` (``dt_dx`` = ∂warp_t/∂d from
the tracer).

All functions are pure and batched; gradients flow to the SDF grid (and its
translation ``p``) through ``f`` and ``∇f`` only — the Hessian and all weight
factors are detached, mirroring the reference's detach pattern exactly
(warp.py:54,68-76).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .sdf import TraceParams
from .trace import TraceResult, sphere_trace_warp
from .vecmath import (
    bbox_distance_inside_d,
    normalize,
    normalize_sqr_with_jac,
    outer,
    replace_grad,
)

__all__ = ["WarpConfig", "warp_weight", "warp_vector_and_jac", "warp_eval", "reparameterize"]


@dataclasses.dataclass(frozen=True)
class WarpConfig:
    """Warp-field hyper-parameters (reference defaults: configs.py:21-29,36-40
    with WarpField2D.__init__ warp.py:10-23)."""

    edge_eps: float = 0.01          # configs.py:21 (edge_epsilon)
    weight_strategy: int = 6        # configs.py:30 — 6 ⇒ ε·t distance scaling
    clamping_thresh: float = 0.05   # configs.py:28 (geom_clamp_threshold)
    normalize_warp_field: bool = True
    max_reparam_depth: int = -1     # <0 ⇒ reparam at every depth


def warp_weight(sdf, x, f_det, g_det, edge_eps):
    """Distance-based warp weight ``w = max(0, 1 − |f|/ε)`` with ε shrunk to
    the bbox-interior distance near the boundary (reference warp.py:25-39).

    All inputs detached.  Returns ``(w, w_d (...,3), edge_eps_d (...,))`` —
    the spatial gradient and the ∂w/∂ε term used by the strategy-6 ε(t)
    chain rule.
    """
    bmin, bmax = sdf.bbox()
    bbox_dist, bbox_dist_d = bbox_distance_inside_d(x, bmin, bmax)
    use_edge_eps = edge_eps <= bbox_dist
    eps_spatial_d = jnp.where(use_edge_eps[..., None], 0.0, bbox_dist_d)
    eps = jnp.minimum(edge_eps, bbox_dist)
    inv_eps = 1.0 / jnp.maximum(eps, 1e-12)
    surf_dist = jnp.abs(f_det)
    fac = 1.0 - surf_dist * inv_eps
    w = jnp.maximum(fac, 0.0)
    w_d = (
        -jnp.sign(f_det)[..., None] * g_det * inv_eps[..., None]
        + (surf_dist * inv_eps * inv_eps)[..., None] * eps_spatial_d
    )
    w_d = jnp.where((fac >= 0.0)[..., None], w_d, 0.0)
    edge_eps_d = jnp.where(use_edge_eps & (fac >= 0), surf_dist * inv_eps * inv_eps, 0.0)
    return w, w_d, edge_eps_d


def warp_vector_and_jac(sdf, x, cfg: WarpConfig):
    """Unweighted warp vector ``V₀ = -f·n̂`` and its spatial Jacobian.

    ``f`` and ``∇f`` attached; normalization direction and Hessian detached
    (reference warp.py:53-63).  Returns ``(V0, jac, f, g)``.
    """
    f, g, h = sdf.eval_all(x)
    h = jax.lax.stop_gradient(h)
    g_det = jax.lax.stop_gradient(g)
    if cfg.normalize_warp_field:
        n_hat, norm_jac = normalize_sqr_with_jac(g_det)
        v0 = -n_hat * f[..., None]
        # per-lane 3×3 matmuls as broadcast-multiply-reduce (einsum lowers
        # to padded batched dot_generals ~100× below the VPU; ops/grid.py
        # _jet_contract docstring)
        jac = (
            -jnp.sum(norm_jac[..., :, :, None] * h[..., None, :, :], axis=-2)
            * f[..., None, None]
            - outer(n_hat, g)
        )
    else:
        v0 = -g_det * f[..., None]
        jac = -h * f[..., None, None] - outer(g_det, g)
    return v0, jac, f, g


def warp_eval(
    sdf,
    x,
    ray_d,
    t,
    dt_dx,
    cfg: WarpConfig,
    active=True,
    warp_weight_mult=None,
    warp_weight_mult_d=None,
):
    """Reparameterized direction + divergence (reference warp.py:47-96).

    Args:
      sdf: SDF pytree (attached — gradients flow to its parameters).
      x: (..., 3) evaluation points ``ray(warp_t)`` (detached).
      ray_d: (..., 3) unit ray directions (may carry gradients at depth>0).
      t: (...,) warp_t from the tracer (detached).
      dt_dx: (..., 3) ∂warp_t/∂d from the tracer (detached).
      warp_weight_mult(_d): optional clamped weight-sum multiplier + gradient.

    Returns:
      (warp, div): ``warp`` has the primal value of ``ray_d`` and the
      gradient of the normalized warped direction; ``div`` is the (attached)
      divergence, zero where inactive.
    """
    active = jnp.broadcast_to(jnp.asarray(active, bool), t.shape)
    active = active & jnp.isfinite(t)
    # Pin inactive lanes to a safe point so their (discarded) math is finite.
    t_safe = jnp.where(active, t, 1.0)
    x = jnp.where(active[..., None], x, 0.5)
    dt_dx = jnp.where(active[..., None], dt_dx, 0.0)

    v0, jac, f, g = warp_vector_and_jac(sdf, x, cfg)

    x_det = jax.lax.stop_gradient(x)
    f_det = jax.lax.stop_gradient(f)
    g_det = jax.lax.stop_gradient(g)
    d_det = jax.lax.stop_gradient(ray_d)

    if cfg.weight_strategy == 6:
        eps = cfg.edge_eps * jax.lax.stop_gradient(t_safe)
    else:
        eps = jnp.full_like(t_safe, cfg.edge_eps)
    w, w_grad, eps_d = warp_weight(sdf, x_det, f_det, g_det, eps)
    # strategy-6 chain term: ∂w/∂ε · ∂ε/∂x with ∂t/∂x ≈ d (warp.py:70)
    w_grad = w_grad + eps_d[..., None] * d_det * cfg.edge_eps

    if warp_weight_mult is not None:
        w_grad = w_grad * warp_weight_mult[..., None] + w[..., None] * warp_weight_mult_d
        w = w * warp_weight_mult

    jac = outer(v0, w_grad) + w[..., None, None] * jac
    warp = v0 * w[..., None]

    # normalize(d·max(c, t) + warp − detach(warp))  (warp.py:80-83)
    warp = replace_grad(jnp.zeros_like(warp), warp)
    warp = ray_d * jnp.maximum(cfg.clamping_thresh, t_safe)[..., None] + warp
    warp = normalize(warp)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), jac.shape)

    def mat3(a, b):  # batched 3×3 matmul, elementwise (see jac note above)
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    proj = mat3(eye - outer(d_det, d_det), jac)
    jac_full = proj + mat3(proj, outer(d_det, dt_dx / t_safe[..., None]))
    div = jac_full[..., 0, 0] + jac_full[..., 1, 1] + jac_full[..., 2, 2]

    active = active & (jax.lax.stop_gradient(w) > 0)
    div = jnp.where(active, div, 0.0)
    warp = jnp.where(active[..., None], warp, ray_d)
    warp = replace_grad(ray_d, warp)
    return warp, div


def reparameterize(
    sdf,
    o,
    d,
    cfg: WarpConfig = WarpConfig(),
    trace_params: TraceParams = TraceParams(),
    maxt=jnp.inf,
    active=True,
    reparam=True,
    refine_active=True,
):
    """Detached warp trace + attached warp eval (reference warp.py:99-123).

    Returns ``(its_t, d_reparam, div)`` where ``its_t`` is the detached
    intersection distance (inf = miss), ``d_reparam`` carries the warp
    gradient (primal = d), and ``div`` is ``replace_grad(1, divergence)``.
    """
    res: TraceResult = sphere_trace_warp(
        sdf, o, d, trace_params, maxt=maxt, active=active, refine_active=refine_active
    )
    if not reparam:
        return res.its_t, d, jnp.ones_like(res.warp_t)

    # NOTE: o and d stay attached here — for secondary (shadow/bounce) rays
    # the warp point x = ray(warp_t) moves with the attached ray origin,
    # which is what makes *nested* reparameterization correct (the
    # reference's ray(warp_t) at warp.py:111 with an attached ray; ablated
    # by its detach_indirect_si flag).
    x = o + jnp.where(jnp.isfinite(res.warp_t), res.warp_t, 0.0)[..., None] * d
    warp, div = warp_eval(
        sdf,
        x,
        d,
        res.warp_t,
        res.warp_t_d,
        cfg,
        active=active,
        warp_weight_mult=res.warp_weight if trace_params.use_weight_sum_weight else None,
        warp_weight_mult_d=res.warp_weight_d if trace_params.use_weight_sum_weight else None,
    )
    d_reparam = replace_grad(d, warp)
    div = replace_grad(jnp.ones_like(div), div)
    return res.its_t, d_reparam, div
