"""Optimization layer: variables, losses, regularizers, configs, training."""

from . import adam, configs, losses, multi_scene, opt_configs, regularizations, shape_opt, validation, variables  # noqa: F401
