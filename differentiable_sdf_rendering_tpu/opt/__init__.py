"""Optimization layer: variables, losses, regularizers, configs, training."""

from . import adam, configs, losses, opt_configs, regularizations, shape_opt, variables  # noqa: F401
