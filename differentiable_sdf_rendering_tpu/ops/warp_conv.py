"""Convolution (Bangaru et al. 2020) reparameterization baseline.

TPU-native re-design of the reference's ``warp_conv.py``: the harmonic-
weight vMF convolution over auxiliary rays.  The reference needs a 170-line
``dr.CustomOp`` with three recorded loops because Dr.Jit must re-trace the
auxiliary rays in each AD direction; in JAX the estimator is written once —
detached weights, attached warp vectors, ``replace_grad`` to pin the primal
direction — and ``jax.vjp``/``jvp`` derive both directions automatically.

Math (warp_conv.py:12-68):
  ω_i ~ vMF(d, κ);   B_i = (n·−ω_i)² (1 for misses);  D_i = e^{κ(1−d·ω_i)}−1
  w_i = 1/(D_i+B_i)^p / pdf(ω_i)                     (detached)
  V_i = normalize(detach(p_hit) + (warp − detach(warp)) − o),  warp = −f·∇f/|∇f|²
  V(d) = Σ w_i V_i / Z,   div = (Σ (∂_ω w_i)·V_i − V·Σ ∂_ω w_i)/Z
  direction = replace_grad(d, normalize(d + V)),  det = replace_grad(1, div)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .interaction import coordinate_frame
from .sampling import square_to_vmf, vmf_pdf
from .sdf import TraceParams
from .trace import sphere_trace
from .vecmath import dot, normalize, normalize_sqr_with_jac, replace_grad

__all__ = ["ConvWarpConfig", "conv_reparameterize"]


@dataclasses.dataclass(frozen=True)
class ConvWarpConfig:
    n_aux_rays: int = 16
    kappa: float = 1e5
    power: float = 3.0
    antithetic: bool = False


def _sample_warp_field(sdf, o, d_det, u2, cfg: ConvWarpConfig, trace_params):
    """One auxiliary ray per lane (warp_conv.py:12-68).  ``o`` may be
    attached (nested reparam); everything else detached except the warp."""
    offset = square_to_vmf(u2, cfg.kappa)          # local, +z = d
    s, t = coordinate_frame(d_det)
    omega = offset[..., 0:1] * s + offset[..., 1:2] * t + offset[..., 2:3] * d_det
    pdf_omega = vmf_pdf(offset[..., 2], cfg.kappa)

    its_t = sphere_trace(sdf, jax.lax.stop_gradient(o), omega, trace_params)
    hit = jnp.isfinite(its_t)
    t_safe = jnp.where(hit, its_t, 1.0)
    p_hit = jax.lax.stop_gradient(o + t_safe[..., None] * omega)

    f, g = sdf.eval_and_grad(p_hit)                # attached via SDF params
    g_det = jax.lax.stop_gradient(g)
    n_sqr, _ = normalize_sqr_with_jac(g_det)
    warp = -n_sqr * f[..., None]
    v_direct = normalize(
        p_hit + replace_grad(jnp.zeros_like(warp), warp) - o
    )
    v_direct = jnp.where(hit[..., None], v_direct, omega)

    n_surf = jax.lax.stop_gradient(normalize(g_det))
    boundary_test = dot(n_surf, -omega) ** 2
    B = jnp.where(hit, boundary_test, 1.0)
    D = jnp.exp(jnp.minimum(cfg.kappa * (1.0 - dot(d_det, omega)), 60.0)) - 1.0
    div_eps = 1e-7
    w_denom = D + B
    w = jnp.where(w_denom > div_eps, w_denom ** (-cfg.power), 0.0) / jnp.maximum(pdf_omega, 1e-30)

    # analytic ∂w/∂ω projected (warp_conv.py:60-66)
    tmp1 = (D + 1.0) * jnp.where(w_denom > div_eps, w_denom ** (-(cfg.power + 1.0)), 0.0)
    tmp1 = tmp1 * cfg.kappa * cfg.power
    tmp2 = omega - d_det * dot(d_det, omega)[..., None]
    d_w_omega = jnp.clip(tmp1, -1e10, 1e10)[..., None] * tmp2
    d_w_omega = d_w_omega / jnp.maximum(pdf_omega, 1e-30)[..., None]

    w = jax.lax.stop_gradient(w)
    d_w_omega = jax.lax.stop_gradient(d_w_omega)
    return w, d_w_omega, w[..., None] * v_direct, dot(d_w_omega, v_direct)


def conv_reparameterize(sdf, o, d, u, cfg: ConvWarpConfig = ConvWarpConfig(),
                        trace_params: TraceParams = TraceParams(), active=True):
    """Reparameterize ``d`` via the vMF convolution (warp_conv.py:71-288).

    Args:
      u: (..., n_aux, 2) uniforms.

    Returns (d_reparam, det) with primal values (d, 1).
    """
    d_det = jax.lax.stop_gradient(normalize(d))
    Z = jnp.zeros(d.shape[:-1], d.dtype)
    dZ = jnp.zeros_like(d)
    Vnum = jnp.zeros_like(d)
    div_lhs = jnp.zeros(d.shape[:-1], d.dtype)

    n_aux = cfg.n_aux_rays
    for i in range(n_aux):
        samples = [u[..., i, :]]
        if cfg.antithetic:
            samples.append(1.0 - u[..., i, :])
        for u2 in samples:
            w, dw, wV, dlhs = _sample_warp_field(sdf, o, d_det, u2, cfg, trace_params)
            Z = Z + w
            dZ = dZ + dw
            Vnum = Vnum + wV
            div_lhs = div_lhs + dlhs

    Z = jnp.maximum(Z, 1e-8)
    V = replace_grad(jnp.zeros_like(Vnum), Vnum) / Z[..., None]
    div = (replace_grad(jnp.zeros_like(div_lhs), div_lhs) - dot(V, dZ)) / Z
    direction = normalize(d + V)

    active = jnp.broadcast_to(jnp.asarray(active, bool), Z.shape)
    direction = jnp.where(active[..., None], direction, d)
    div = jnp.where(active, div, 0.0)
    d_out = replace_grad(d, direction)
    det = replace_grad(jnp.ones_like(div), div)
    return d_out, det
