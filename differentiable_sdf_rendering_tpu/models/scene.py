"""Scene pytree: SDF + BSDF + emitter + camera rig.

The functional counterpart of the reference's Mitsuba XML scene + dummy-SDF
shape arrangement (``/root/reference/python/shape_opt.py:44-51``,
``integrators/reparam.py:56-80``): here the SDF *is* a first-class scene
member, the BSDF attached to it is explicit, and the differentiable
parameters are just the pytree leaves (``mi.traverse``/``params.keep`` ≡
selecting leaves).
"""

from __future__ import annotations

from typing import Any

from flax import struct

from ..ops.sdf import GridSDF
from .bsdf import DiffuseBSDF
from .camera import PerspectiveCamera, regular_cameras
from .emitter import ConstantEmitter

__all__ = ["Scene"]


@struct.dataclass
class Scene:
    sdf: GridSDF
    bsdf: DiffuseBSDF
    emitter: ConstantEmitter
    cameras: PerspectiveCamera
    # Optional auxiliary TriangleMesh for mixed scenes (the reference's
    # OptiX-traced extra shapes, reparam.py:201-232); None = pure-SDF scene
    # and the mesh path is compiled out entirely.
    mesh: Any = None
    # Optional finite-position AreaEmitter (the reference's `plane_area`
    # scene / studio relight rig): direct hits see its radiance, NEE samples
    # it with a finite-distance shadow ray.  None = environment lighting only.
    area_emitter: Any = None

    @classmethod
    def create(cls, sdf_data, bsdf=None, emitter=None, cameras=None, n_views=12, res=128,
               mesh=None, area_emitter=None):
        sdf = sdf_data if isinstance(sdf_data, GridSDF) else GridSDF.create(sdf_data)
        return cls(
            sdf=sdf,
            bsdf=bsdf if bsdf is not None else DiffuseBSDF.create(),
            emitter=emitter if emitter is not None else ConstantEmitter.create(),
            cameras=cameras if cameras is not None else regular_cameras(n_views, resx=res, resy=res),
            mesh=mesh,
            area_emitter=area_emitter,
        )

    @property
    def n_views(self):
        return self.cameras.origin.shape[0]
