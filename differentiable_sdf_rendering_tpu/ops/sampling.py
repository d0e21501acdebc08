"""Counter-based per-lane RNG and sampling warps.

Replaces the reference's PCG32/sample_tea_32 samplers and vMF warps
(``/root/reference/python/integrators/sdf_prb_reparam.py:13-30``,
``/root/reference/python/warp_conv.py:20-22``) with JAX's threefry: every
lane derives its stream from ``fold_in(seed_key, global_lane_index)``, so
estimates are bit-identical regardless of how the wavefront is sharded
across chips (SURVEY.md §2.4 "deterministic per-ray RNG").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "lane_uniforms",
    "square_to_cosine_hemisphere",
    "cosine_hemisphere_pdf",
    "square_to_uniform_sphere",
    "square_to_vmf",
    "vmf_pdf",
    "mis_weight",
]


def lane_uniforms(seed, lane_idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """(len(lane_idx), n) uniforms, deterministic per (seed, lane index)."""
    base = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(lane_idx)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(keys)


def square_to_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """[0,1)² → cosine-weighted hemisphere around +z (local frame)."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdf(wo_local: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(wo_local[..., 2], 0.0) / jnp.pi


def square_to_uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_vmf(u: jnp.ndarray, kappa: float) -> jnp.ndarray:
    """[0,1)² → von Mises-Fisher sample around +z (numerically stable for
    large κ; used by the convolution-warp baseline, warp_conv.py:20)."""
    # cos θ = 1 + log(u + (1-u) e^{-2κ}) / κ, stable as log1p((u-1)(1-e^{-2κ}))
    ck = 1.0 + jnp.log1p((u[..., 0] - 1.0) * -jnp.expm1(-2.0 * kappa)) / kappa
    ck = jnp.clip(ck, -1.0, 1.0)
    sk = jnp.sqrt(jnp.maximum(1.0 - ck * ck, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sk * jnp.cos(phi), sk * jnp.sin(phi), ck], axis=-1)


def vmf_pdf(cos_theta: jnp.ndarray, kappa: float) -> jnp.ndarray:
    """vMF density on the sphere; stable form κ/(2π(1−e^{-2κ})) e^{κ(cosθ−1)}."""
    norm = kappa / (2.0 * jnp.pi * -jnp.expm1(-2.0 * kappa))
    return norm * jnp.exp(kappa * (cos_theta - 1.0))


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (β=2), matching mitsuba.ad.integrators.common.mis_weight
    (used at sdf_direct_reparam.py:79,106)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
    return jnp.where(pdf_a > 0, w, 0.0)
