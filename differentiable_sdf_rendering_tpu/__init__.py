"""differentiable_sdf_rendering_tpu — a TPU-native differentiable SDF renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Vicini, Speierer, Jakob, "Differentiable Signed Distance Function Rendering"
(SIGGRAPH 2022; reference implementation rgl-epfl/differentiable-sdf-rendering).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  ops/       — grid interpolation, sphere tracing, warp fields, redistancing,
               film splatting, sampling (the compute kernels; XLA + Pallas)
  models/    — cameras, BSDFs, emitters, scenes, integrators (light transport)
  opt/       — variables, losses, regularizers, configs, the training loop
  parallel/  — device-mesh sharding of rays and views (pjit/shard_map)
  utils/     — .vol/EXR/PNG I/O, metadata, misc

Everything is functional: state lives in explicit pytrees, each optimization
iteration is a single jit-compiled step function.
"""

__version__ = "0.1.0"

from . import ops, models, opt, parallel, utils  # noqa: F401
