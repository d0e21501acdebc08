"""Optimization layer: variables, losses, regularizers, configs, training."""
