"""BSDF models: Lambertian diffuse and a principled-lite (diffuse+GGX).

Minimal JAX BSDF library standing in for the Mitsuba BSDFs the reference
scenes use (``diffuse`` and ``principled`` with volume-textured base_color /
roughness — SURVEY.md §2.3, opt_configs.py:286-302).  All evaluation is in
the local shading frame (+z = normal) and returns values *premultiplied by
the outgoing cosine*, like Mitsuba's ``bsdf.eval``.

Albedo/roughness may be constants or volume textures sampled trilinearly at
the (unit-cube) hit point — the representation the reference optimizes
(``VolumeVariable``, variables.py:79-133).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..ops import grid as gridops
from ..ops.sampling import cosine_hemisphere_pdf, square_to_cosine_hemisphere

__all__ = ["ConductorBSDF", "DiffuseBSDF", "PrincipledBSDF"]


def _eval_texture(const, tex, p):
    """Constant or trilinear volume texture lookup at unit-cube point p."""
    if tex is None:
        return jnp.broadcast_to(const, p.shape[:-1] + const.shape)
    chans = [gridops.grid_eval_trilinear(tex[..., c], p) for c in range(tex.shape[-1])]
    return jnp.stack(chans, axis=-1)


@struct.dataclass
class ConductorBSDF:
    """Smooth (delta) specular conductor — Mitsuba's ``conductor`` plugin,
    used by the reference's mirror in the ``mirror-opt`` scenes
    (/root/reference/python/opt_configs.py:257-273; optimized through with
    WarpPRB, figures/indirect_reparam/indirect_reparam.py:29-33).

    Delta-lobe conventions (Mitsuba): ``eval``/``eval_pdf`` are identically
    zero (a delta has no continuous density); ``sample`` returns the mirror
    direction with ``pdf = 1`` and ``weight = reflectance``.  Integrators
    must check ``delta`` and give BSDF-sampled delta bounces MIS weight 1.
    """

    reflectance: jnp.ndarray  # (3,)
    delta = True

    @classmethod
    def create(cls, reflectance=(0.95, 0.95, 0.95)):
        return cls(reflectance=jnp.asarray(reflectance, jnp.float32))

    def eval(self, si, wo_local):
        return jnp.zeros(wo_local.shape[:-1] + (3,), wo_local.dtype)

    def eval_pdf(self, si, wo_local):
        z = jnp.zeros(wo_local.shape[:-1], wo_local.dtype)
        return jnp.zeros(wo_local.shape[:-1] + (3,), wo_local.dtype), z

    def sample(self, si, u2):
        """→ (wo_local = mirror(wi), pdf = 1, weight = reflectance)."""
        wi = si.wi
        wo = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
        valid = wi[..., 2] > 0
        pdf = jnp.where(valid, 1.0, 0.0)
        weight = jnp.where(valid[..., None], self.reflectance, 0.0)
        return wo, pdf, weight


@struct.dataclass
class DiffuseBSDF:
    """Lambertian BSDF; albedo constant or volume-textured."""

    albedo: jnp.ndarray                 # (3,) constant fallback
    albedo_tex: jnp.ndarray | None = None  # optional (Z, Y, X, 3)
    delta = False

    @classmethod
    def create(cls, albedo=(0.8, 0.8, 0.8), albedo_tex=None):
        return cls(albedo=jnp.asarray(albedo, jnp.float32), albedo_tex=albedo_tex)

    def eval(self, si, wo_local):
        """f(wi, wo)·cosθo; zero below the horizon (two-sided off)."""
        a = _eval_texture(self.albedo, self.albedo_tex, si.p)
        cos_i = si.wi[..., 2]
        cos_o = wo_local[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        return jnp.where(valid[..., None], a / jnp.pi * cos_o[..., None], 0.0)

    def eval_pdf(self, si, wo_local):
        val = self.eval(si, wo_local)
        pdf = jnp.where(si.wi[..., 2] > 0, cosine_hemisphere_pdf(wo_local), 0.0)
        return val, pdf

    def sample(self, si, u2):
        """→ (wo_local, pdf, weight = f·cos/pdf)."""
        wo = square_to_cosine_hemisphere(u2)
        pdf = cosine_hemisphere_pdf(wo)
        a = _eval_texture(self.albedo, self.albedo_tex, si.p)
        valid = (si.wi[..., 2] > 0) & (pdf > 0)
        weight = jnp.where(valid[..., None], a, 0.0)  # (f·cos)/pdf = albedo
        return wo, jnp.where(valid, pdf, 0.0), weight


def _ggx_d(cos_h, alpha):
    a2 = alpha * alpha
    d = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-10)


def _smith_g1(cos_v, alpha):
    a2 = alpha * alpha
    return 2.0 * cos_v / jnp.maximum(
        cos_v + jnp.sqrt(a2 + (1.0 - a2) * cos_v * cos_v), 1e-10
    )


def _schlick(f0, cos_t):
    return f0 + (1.0 - f0) * (1.0 - cos_t) ** 5


@struct.dataclass
class PrincipledBSDF:
    """Simplified principled BSDF: Lambertian base + GGX specular lobe.

    Stands in for Mitsuba's ``principled`` with textured base_color and
    roughness (the reference's `principled-12` config).  Sampling is
    cosine-hemisphere (adequate for the moderate roughness ∈ [0.1, 0.8] the
    reference clamps to — variables.py:115-118).
    """

    base_color: jnp.ndarray                    # (3,)
    roughness: jnp.ndarray                     # ()
    base_color_tex: jnp.ndarray | None = None  # (Z, Y, X, 3)
    roughness_tex: jnp.ndarray | None = None   # (Z, Y, X, 1)
    specular: float = struct.field(pytree_node=False, default=0.04)
    delta = False

    @classmethod
    def create(cls, base_color=(0.8, 0.8, 0.8), roughness=0.4, base_color_tex=None, roughness_tex=None):
        return cls(
            base_color=jnp.asarray(base_color, jnp.float32),
            roughness=jnp.asarray(roughness, jnp.float32),
            base_color_tex=base_color_tex,
            roughness_tex=roughness_tex,
        )

    def _params_at(self, p):
        color = _eval_texture(self.base_color, self.base_color_tex, p)
        rough = _eval_texture(self.roughness[None], self.roughness_tex, p)[..., 0]
        return color, jnp.clip(rough, 0.1, 0.8)

    def eval(self, si, wo_local):
        color, rough = self._params_at(si.p)
        wi, wo = si.wi, wo_local
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        h = wi + wo
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-10)
        alpha = rough * rough
        D = _ggx_d(h[..., 2], alpha)
        G = _smith_g1(cos_i, alpha) * _smith_g1(cos_o, alpha)
        F = _schlick(self.specular, jnp.sum(wi * h, -1))
        # f_spec·cosθo = D·G·F/(4 cosθi cosθo) · cosθo = D·G·F/(4 cosθi)
        spec = D * G * F / jnp.maximum(4.0 * cos_i, 1e-10)
        diff = color / jnp.pi * cos_o[..., None]
        val = diff + spec[..., None]
        return jnp.where(valid[..., None], val, 0.0)

    def eval_pdf(self, si, wo_local):
        val = self.eval(si, wo_local)
        pdf = jnp.where(si.wi[..., 2] > 0, cosine_hemisphere_pdf(wo_local), 0.0)
        return val, pdf

    def sample(self, si, u2):
        wo = square_to_cosine_hemisphere(u2)
        pdf = cosine_hemisphere_pdf(wo)
        val = self.eval(si, wo)
        valid = pdf > 1e-8
        weight = jnp.where(valid[..., None], val / jnp.maximum(pdf, 1e-8)[..., None], 0.0)
        return wo, jnp.where(valid, pdf, 0.0), weight
