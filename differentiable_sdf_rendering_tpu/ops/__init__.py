"""Compute kernels: interpolation, tracing, warping, redistancing, film."""

from . import film, grid, initializers, interaction, pallas_redistance, redistance, sampling, sdf, sdf2d, trace, vecmath, warp, warp_conv  # noqa: F401
