"""Named scenes: target SDFs + lighting/BSDF rigs for reconstruction runs.

The reference distributes its scenes (dragon, bunny, chair, ...) as a
separately-downloaded asset zip (``/root/reference/README.md:66-68``,
SURVEY.md §2.2) which is not available here.  This module provides:

  * procedural analytic target SDFs (redistanced onto grids) registered
    under the reference's scene names so configs/benchmarks keep working,
  * ``.vol``-file loading when real assets are present
    (``scenes/sdfs/<name>.vol`` under a scene directory),
  * per-scene emitter/BSDF rigs.

Every target is a valid SDF on the unit cube, comparable in silhouette
complexity to the reference assets (multi-lobe, holes, thin features).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops.initializers import voxel_centers
from ..ops.redistance import redistance
from .bsdf import DiffuseBSDF, PrincipledBSDF
from .emitter import AreaEmitter, ConstantEmitter, VMFEmitter, make_gradient_envmap

__all__ = ["target_sdf", "scene_rig", "scene_rig_full", "SCENE_NAMES"]


def _length(v, axis=-1):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis), 1e-30))


def _torus(p, R=0.25, r=0.11, center=(0.5, 0.45, 0.5)):
    q = p - jnp.asarray(center)
    ring = jnp.sqrt(jnp.maximum(q[..., 0] ** 2 + q[..., 2] ** 2, 1e-30)) - R
    return jnp.sqrt(ring**2 + q[..., 1] ** 2) - r


def _sphere(p, c, r):
    return _length(p - jnp.asarray(c)) - r


def _box(p, c, b, rounding=0.02):
    q = jnp.abs(p - jnp.asarray(c)) - jnp.asarray(b)
    return (
        _length(jnp.maximum(q, 0.0))
        + jnp.minimum(jnp.max(q, axis=-1), 0.0)
        - rounding
    )


def _capsule(p, a, b, r):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    pa = p - a
    ba = b - a
    h = jnp.clip(jnp.sum(pa * ba, -1) / jnp.sum(ba * ba), 0.0, 1.0)
    return _length(pa - ba * h[..., None]) - r


def _smooth_union(d1, d2, k=0.03):
    h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
    return d2 * (1 - h) + d1 * h - k * h * (1 - h)


def _dragon_like(p):
    """Multi-lobe serpentine body with horns/legs — a silhouette-complexity
    stand-in for the dragon asset."""
    t = (p[..., 0] - 0.2) / 0.6
    spine_y = 0.45 + 0.12 * jnp.sin(t * 5.0)
    spine_z = 0.5 + 0.10 * jnp.sin(t * 3.0 + 1.0)
    body_r = 0.085 * (1.0 - 0.55 * jnp.abs(t - 0.5)) + 0.025 * jnp.sin(t * 11.0) ** 2
    spine = jnp.stack([p[..., 0], spine_y, spine_z], -1)
    d = _length(p - spine) - jnp.clip(body_r, 0.02, 0.12)
    d = jnp.where(jnp.abs(t - 0.5) > 0.55, d + 0.2, d)  # cap the ends
    head = _sphere(p, (0.78, 0.58, 0.52), 0.09)
    horn1 = _capsule(p, (0.80, 0.62, 0.50), (0.88, 0.74, 0.46), 0.02)
    horn2 = _capsule(p, (0.76, 0.63, 0.55), (0.80, 0.75, 0.62), 0.02)
    leg1 = _capsule(p, (0.35, 0.40, 0.45), (0.33, 0.22, 0.42), 0.03)
    leg2 = _capsule(p, (0.55, 0.40, 0.56), (0.58, 0.22, 0.60), 0.03)
    tail = _capsule(p, (0.22, 0.42, 0.48), (0.10, 0.55, 0.60), 0.022)
    d = _smooth_union(d, head, 0.04)
    for part in (horn1, horn2, leg1, leg2, tail):
        d = _smooth_union(d, part, 0.025)
    return d


def _bunny_like(p):
    body = _sphere(p, (0.5, 0.40, 0.5), 0.17)
    head = _sphere(p, (0.5, 0.60, 0.62), 0.10)
    ear1 = _capsule(p, (0.45, 0.64, 0.60), (0.40, 0.84, 0.55), 0.035)
    ear2 = _capsule(p, (0.55, 0.64, 0.60), (0.60, 0.84, 0.55), 0.035)
    tail = _sphere(p, (0.5, 0.42, 0.30), 0.055)
    d = _smooth_union(body, head, 0.05)
    d = _smooth_union(d, ear1, 0.02)
    d = _smooth_union(d, ear2, 0.02)
    return _smooth_union(d, tail, 0.02)


def _chair_like(p):
    seat = _box(p, (0.5, 0.42, 0.5), (0.16, 0.02, 0.16))
    back = _box(p, (0.5, 0.58, 0.35), (0.16, 0.16, 0.02))
    legs = None
    for cx in (0.37, 0.63):
        for cz in (0.37, 0.63):
            leg = _capsule(p, (cx, 0.2, cz), (cx, 0.42, cz), 0.022)
            legs = leg if legs is None else jnp.minimum(legs, leg)
    return jnp.minimum(jnp.minimum(seat, back), legs)


def _cubes(p):
    d = None
    for i, c in enumerate([(0.35, 0.35, 0.35), (0.65, 0.4, 0.6), (0.45, 0.62, 0.45)]):
        b = _box(p, c, (0.1, 0.1, 0.1), rounding=0.015)
        d = b if d is None else jnp.minimum(d, b)
    return d


def _torus_shadow(p):
    """Torus floating above a ground slab (shadow-driven reconstruction)."""
    torus = _torus(p, R=0.22, r=0.09, center=(0.5, 0.55, 0.5))
    return torus


_PROCEDURAL = {
    "dragon": _dragon_like,
    "bunny": _bunny_like,
    "chair": _chair_like,
    "chair-diffuse": _chair_like,
    "head": lambda p: _smooth_union(
        _sphere(p, (0.5, 0.5, 0.5), 0.2), _sphere(p, (0.5, 0.42, 0.68), 0.08), 0.05
    ),
    "boar": _bunny_like,
    "hotdog-diffuse": lambda p: _capsule(p, (0.3, 0.45, 0.5), (0.7, 0.45, 0.5), 0.11),
    "lego": _cubes,
    "cubes": _cubes,
    "cranium": lambda p: _sphere(p, (0.5, 0.5, 0.5), 0.24),
    "bench": _chair_like,
    "torus": _torus,
    "torus-shadow": _torus_shadow,
    "mirror-opt": _torus,
    "sphere": lambda p: _sphere(p, (0.5, 0.5, 0.5), 0.3),
    "block": lambda p: _box(p, (0.5, 0.5, 0.5), (0.25, 0.12, 0.18)),
    # object-above-a-plane scenes lit by a finite area light (the reference's
    # plane_area / plane_red_object scene family, SURVEY.md §2.2)
    "plane_area": lambda p: _smooth_union(
        _sphere(p, (0.5, 0.52, 0.5), 0.17),
        _box(p, (0.5, 0.33, 0.5), (0.17, 0.03, 0.17)),
        0.03,
    ),
    "plane_red_object": lambda p: _torus(p, R=0.2, r=0.08, center=(0.5, 0.5, 0.5)),
}

SCENE_NAMES = sorted(_PROCEDURAL)


#: checked-in .vol assets produced by the own mesh→SDF pipeline
#: (scripts/build_assets.py; reference data contract README.md:66-68)
ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "scenes", "assets")


def studio_hdr_envmap():
    """Image-based environment light from the checked-in equirect HDR asset
    (scripts/build_assets.py writes it; reference scenes light with real
    envmaps like ``cathedral.xml``).  Falls back to the procedural gradient
    sky when the asset is absent."""
    from .emitter import GridEnvmap

    path = os.path.join(ASSET_DIR, "envmaps", "studio_sky.exr")
    if os.path.exists(path):
        return GridEnvmap.from_image(path)
    return make_gradient_envmap()


def target_sdf(scene_name: str, res: int = 128, scene_dir: str | None = None) -> jnp.ndarray:
    """Target SDF grid for a named scene: a real ``.vol`` asset if present
    (from ``scene_dir`` or the checked-in ``scenes/assets``), else the
    procedural stand-in, redistanced to a valid SDF."""
    if scene_name.endswith("-hdr"):  # lighting variant, same geometry
        scene_name = scene_name[: -len("-hdr")]
    for sdir in (scene_dir, ASSET_DIR):
        if sdir is None:
            continue
        vol = os.path.join(sdir, "sdfs", f"{scene_name}_{res}.vol")
        if os.path.exists(vol):
            from ..utils.io import read_vol

            return redistance(jnp.asarray(read_vol(vol)[..., 0]))
    if scene_name not in _PROCEDURAL:
        raise ValueError(f"Unknown scene '{scene_name}'; valid: {SCENE_NAMES}")
    pts = voxel_centers(res)
    d = _PROCEDURAL[scene_name](pts.reshape(-1, 3)).reshape(res, res, res)
    return redistance(d)


def scene_rig_full(scene_name: str, param_keys=("sdf",)):
    """Per-scene emitter + BSDF + optional area light / auxiliary mesh (the
    role of the scene XML's emitter/bsdf/shape blocks).  Returns a dict with
    keys ``bsdf``, ``emitter``, ``area_emitter``, ``mesh``."""
    if "principled" in scene_name:
        bsdf = PrincipledBSDF.create()
    else:
        bsdf = DiffuseBSDF.create(albedo=(0.8, 0.8, 0.8))
    area = None
    mesh = None
    if scene_name in ("torus-shadow", "mirror-opt"):
        from ..ops.mesh_intersect import TriangleMesh

        emitter = VMFEmitter.create(mu=(0.2, 0.9, 0.1), scale=(30.0,) * 3, ambient=(0.05,) * 3, kappa=60.0)
        if scene_name == "torus-shadow":
            # diffuse ground plane under the torus: the reconstruction
            # signal is the torus's cast shadow on the receiver (reference
            # torus-shadow-1, opt_configs.py:247-256; hybrid base-class
            # intersect reparam.py:201-232)
            mesh = TriangleMesh.floor(height=0.22, half_extent=4.0, albedo=(0.65, 0.65, 0.65))
        else:
            # vertical mirror behind the object w.r.t. sensor 0 (+x side
            # camera): the sensor sees the torus directly AND reflected —
            # gradients through the reflection are the nested/indirect
            # reparam capability (reference mirror-opt, opt_configs.py:
            # 257-273, optimized with WarpPRB)
            mesh = TriangleMesh.rect(
                corner=(-0.35, -0.6, -0.6), e0=(0.0, 2.2, 0.0), e1=(0.0, 0.0, 2.2),
                albedo=(0.88, 0.88, 0.92), material="mirror",
            )
    elif scene_name in ("plane_area", "plane_red_object"):
        # dim ambient + an overhead area panel; the estimator NEE-samples the
        # panel with finite-distance shadow rays (reference plane_area scene)
        emitter = ConstantEmitter.create((0.05, 0.05, 0.05))
        area = AreaEmitter.create(
            corner=(0.2, 1.25, 0.2), e0=(0.6, 0.0, 0.0), e1=(0.0, 0.0, 0.6),
            radiance=(14.0, 14.0, 14.0),
        )
        if scene_name == "plane_red_object":
            bsdf = DiffuseBSDF.create(albedo=(0.75, 0.25, 0.2))
    elif scene_name.endswith("-hdr"):
        # image-based environment lighting (the reference's envmap scenes,
        # ``emitters/cathedral.xml`` — SURVEY.md §2.2): the checked-in
        # equirect HDR asset with alias-table importance sampling; any
        # scene name gains it via the '-hdr' suffix (geometry unchanged)
        emitter = studio_hdr_envmap()
    else:
        emitter = make_gradient_envmap()
    if len(param_keys) > 2:
        bsdf = PrincipledBSDF.create()
    return {"bsdf": bsdf, "emitter": emitter, "area_emitter": area, "mesh": mesh}


def scene_mesh(scene_name: str):
    """Auxiliary mesh of a scene rig (None for pure-SDF scenes)."""
    return scene_rig_full(scene_name)["mesh"]


def scene_rig(scene_name: str, param_keys=("sdf",)):
    """Per-scene emitter + BSDF (back-compat 2-tuple; see
    :func:`scene_rig_full`)."""
    rig = scene_rig_full(scene_name, param_keys)
    return rig["bsdf"], rig["emitter"]
