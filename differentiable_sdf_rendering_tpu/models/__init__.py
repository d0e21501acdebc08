"""Scene model: cameras, BSDFs, emitters, integrators."""

from . import bsdf, camera, emitter, integrator, prb, scene, scene_file, scenes_zoo  # noqa: F401
