"""Scene files: JSON scene descriptions (the role of the reference's
Mitsuba XML scene templates, SURVEY.md §2.2).

The reference distributes scenes as XML templates with substitutable
parameters (``resx``, ``resy``, ``sdf_filename``, ``integrator``, ...).
Here a scene is a JSON file::

    {
      "sdf": {"vol": "sdfs/bunny_64.vol"}      // or {"procedural": "bunny", "res": 64}
      "bsdf": {"type": "diffuse", "albedo": [0.8, 0.8, 0.8]},
      "emitter": {"type": "gradient_envmap"}   // | constant | vmf | envmap_png
      "cameras": {"type": "regular", "n": 12, "resx": 128, "resy": 128}
                                               // | {"type": "lookat", "origins": [...], "target": [...]}
      "mesh": {"type": "floor", "height": 0.1, "albedo": [0.6, 0.6, 0.6]}
                                               // optional mixed-scene geometry; | {"obj": "floor.obj"}
    }

Relative asset paths resolve against the JSON file's directory.  Template
parameters (resx/resy/spp overrides) are keyword arguments to
:func:`load_scene_file`, mirroring the reference's ``mi.load_file(...,
resx=..., resy=...)`` UX (shape_opt.py:44).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.redistance import redistance
from ..ops.sdf import GridSDF
from .bsdf import DiffuseBSDF, PrincipledBSDF
from .camera import PerspectiveCamera, look_at, regular_cameras
from .emitter import ConstantEmitter, GridEnvmap, VMFEmitter, make_gradient_envmap
from .scene import Scene

__all__ = ["load_scene_file"]


def _load_sdf(spec, base_dir, res_override=None):
    if "vol" in spec:
        from ..utils.io import read_vol

        data = read_vol(os.path.join(base_dir, spec["vol"]))[..., 0]
        return redistance(jnp.asarray(data))
    from .scenes_zoo import target_sdf

    return target_sdf(spec.get("procedural", "sphere"), res_override or spec.get("res", 64))


def _load_bsdf(spec):
    kind = spec.get("type", "diffuse")
    if kind == "principled":
        return PrincipledBSDF.create(
            base_color=tuple(spec.get("base_color", (0.8, 0.8, 0.8))),
            roughness=spec.get("roughness", 0.4),
        )
    return DiffuseBSDF.create(albedo=tuple(spec.get("albedo", (0.8, 0.8, 0.8))))


def _load_emitter(spec, base_dir):
    kind = spec.get("type", "gradient_envmap")
    if kind == "constant":
        return ConstantEmitter.create(tuple(spec.get("radiance", (1.0, 1.0, 1.0))))
    if kind == "vmf":
        return VMFEmitter.create(
            mu=tuple(spec.get("mu", (0.5, 0.8, -0.3))),
            scale=tuple(spec.get("scale", (6.0, 6.0, 6.0))),
            ambient=tuple(spec.get("ambient", (0.15, 0.15, 0.15))),
            kappa=spec.get("kappa", 20.0),
        )
    if kind == "envmap_png":
        from ..utils.io import read_png

        img = read_png(os.path.join(base_dir, spec["path"])).astype(np.float32) / 255.0
        return GridEnvmap.create(img[..., :3] ** 2.2 * spec.get("scale", 1.0))
    if kind in ("envmap", "envmap_exr"):
        # image-based HDR environment (the reference's envmap plugin +
        # cathedral.xml assets); importance-sampling CDFs built on load
        return GridEnvmap.from_image(
            os.path.join(base_dir, spec["path"]), scale=spec.get("scale", 1.0)
        )
    return make_gradient_envmap()


def _load_area_emitter(spec):
    """Optional finite-position rectangular area light (the reference's
    rectangle+area emitter shapes, plane_area scene family)."""
    if spec is None:
        return None
    from .emitter import AreaEmitter

    return AreaEmitter.create(
        corner=tuple(spec["corner"]),
        e0=tuple(spec["e0"]),
        e1=tuple(spec["e1"]),
        radiance=tuple(spec.get("radiance", (10.0, 10.0, 10.0))),
    )


def _load_mesh(spec, base_dir):
    """Optional auxiliary TriangleMesh for mixed scenes (the reference's
    extra XML shapes traced by OptiX, reparam.py:201-232)."""
    if spec is None:
        return None
    from ..ops.mesh_intersect import TriangleMesh

    albedo = tuple(spec.get("albedo", (0.5, 0.5, 0.5)))
    material = spec.get("material", "diffuse")  # 'diffuse' | 'mirror'
    if material not in ("diffuse", "mirror"):
        raise ValueError(f"unknown mesh material {material!r}")
    if "obj" in spec:
        from ..utils.mesh import load_obj

        verts, faces = load_obj(os.path.join(base_dir, spec["obj"]))
        verts = np.asarray(verts, np.float32)
        if "scale" in spec:
            verts = verts * np.float32(spec["scale"])
        if "translate" in spec:
            verts = verts + np.asarray(spec["translate"], np.float32)
        return TriangleMesh.create(verts, faces, albedo, material=material)
    kind = spec.get("type", "floor")
    if kind == "rect":
        return TriangleMesh.rect(
            corner=tuple(spec["corner"]), e0=tuple(spec["e0"]), e1=tuple(spec["e1"]),
            albedo=albedo, material=material,
        )
    if kind != "floor":
        raise ValueError(f"unknown mesh type {kind!r} (expected 'floor', 'rect' or an 'obj' entry)")
    return TriangleMesh.floor(
        height=spec.get("height", 0.0),
        half_extent=spec.get("half_extent", 10.0),
        albedo=albedo,
        material=material,
    )


def _load_cameras(spec, resx=None, resy=None):
    rx = resx or spec.get("resx", 128)
    ry = resy or spec.get("resy", 128)
    kind = spec.get("type", "regular")
    if kind == "lookat":
        origins = [tuple(o) for o in spec["origins"]]
        target = tuple(spec.get("target", (0.5, 0.5, 0.5)))
        rots = jnp.stack([look_at(jnp.asarray(o, jnp.float32), target) for o in origins])
        th = jnp.full((len(origins),), jnp.tan(jnp.deg2rad(spec.get("fov", 39.0)) / 2.0), jnp.float32)
        return PerspectiveCamera(
            origin=jnp.asarray(origins, jnp.float32), rot=rots, tan_half_fov=th, resx=rx, resy=ry
        )
    return regular_cameras(
        spec.get("n", 12), spec.get("angle_shift", 0.0), rx, ry,
        radius=spec.get("radius", 2.0),
    )


def load_scene_file(path: str, resx: int | None = None, resy: int | None = None, sdf_res: int | None = None) -> Scene:
    """Load a JSON scene description → :class:`Scene` (template-parameter
    overrides via keyword arguments, like the reference's scene loading)."""
    with open(path) as f:
        spec = json.load(f)
    base_dir = os.path.dirname(os.path.abspath(path))
    return Scene(
        sdf=GridSDF.create(_load_sdf(spec.get("sdf", {}), base_dir, sdf_res)),
        bsdf=_load_bsdf(spec.get("bsdf", {})),
        emitter=_load_emitter(spec.get("emitter", {}), base_dir),
        cameras=_load_cameras(spec.get("cameras", {}), resx, resy),
        mesh=_load_meshes(spec, base_dir),
        area_emitter=_load_area_emitter(spec.get("area_emitter")),
    )


def _load_meshes(spec, base_dir):
    """``"mesh": {...}`` (one shape) or ``"meshes": [{...}, ...]`` (an
    arbitrary shape set with per-shape materials, merged into one soup —
    the reference's Mitsuba shape list, reparam.py:209-232)."""
    from ..ops.mesh_intersect import TriangleMesh

    specs = []
    if spec.get("mesh") is not None:
        specs.append(spec["mesh"])
    specs.extend(spec.get("meshes", []))
    if not specs:
        return None
    return TriangleMesh.merge([_load_mesh(s, base_dir) for s in specs])
