"""Compute kernels: interpolation, tracing, warping, redistancing, film."""

from . import grid, initializers, redistance, sdf  # noqa: F401
