"""Differentiable surface interactions for SDF intersections.

Counterpart of the reference's ``SDFBase.compute_surface_interaction``
(``/root/reference/python/shapes.py:347-366``): the detached trace distance
is re-attached through the implicit-function theorem,

    t_attached = replace_grad(t, f(p) / detach(⟨∇f, −d⟩)),

the shading normal is the attached normalized SDF gradient, and a shading
frame is built with the branchless Duff et al. orthonormal basis (the role of
Mitsuba's ``initialize_sh_frame``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .vecmath import dot, normalize, replace_grad

__all__ = ["SurfaceInteraction", "coordinate_frame", "compute_surface_interaction"]


@struct.dataclass
class SurfaceInteraction:
    """Batched surface interaction (leaves (...,) / (..., 3))."""

    valid: jnp.ndarray  # bool — finite intersection
    t: jnp.ndarray      # attached hit distance
    p: jnp.ndarray      # attached hit point
    n: jnp.ndarray      # attached shading normal (unit)
    s: jnp.ndarray      # frame tangent
    b: jnp.ndarray      # frame bitangent
    wi: jnp.ndarray     # incident dir in local frame (-ray.d)

    def to_local(self, v):
        return jnp.stack([dot(v, self.s), dot(v, self.b), dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (
            v[..., 0:1] * self.s + v[..., 1:2] * self.b + v[..., 2:3] * self.n
        )


def coordinate_frame(n: jnp.ndarray):
    """Branchless orthonormal basis around unit ``n`` (Duff et al. 2017)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


def compute_surface_interaction(sdf, o, d, its_t, differentiable: bool = True):
    """Build an attached :class:`SurfaceInteraction` at ``o + its_t·d``.

    ``its_t`` is the detached tracer output (inf = miss); ``d`` may carry
    warp gradients.  Invalid lanes get t=inf but finite (zero-point) frame
    data so downstream math stays NaN-free.
    """
    valid = jnp.isfinite(its_t)
    t_safe = jnp.where(valid, its_t, 0.0)
    p0 = o + t_safe[..., None] * d

    if differentiable:
        f, g = sdf.eval_and_grad(p0)
        denom = jax.lax.stop_gradient(dot(g, -d))
        denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        t_att = replace_grad(t_safe, f / denom)
    else:
        t_att = t_safe

    p = o + t_att[..., None] * d
    n = normalize(sdf.eval_grad(p))
    s, b = coordinate_frame(jax.lax.stop_gradient(n))
    si = SurfaceInteraction(
        valid=valid,
        t=jnp.where(valid, t_att, jnp.inf),
        p=p,
        n=n,
        s=s,
        b=b,
        wi=jnp.zeros_like(d),
    )
    wi = si.to_local(-d)
    return si.replace(wi=jnp.where(valid[..., None], wi, -d))
