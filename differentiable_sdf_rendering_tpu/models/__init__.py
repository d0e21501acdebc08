"""Scene model: cameras, BSDFs, emitters, integrators."""

from . import bsdf, camera, emitter, integrator, scene, scenes_zoo  # noqa: F401
