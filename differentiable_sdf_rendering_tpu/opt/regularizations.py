"""SDF grid regularizers (reference ``python/regularizations.py``)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["discrete_laplacian_reg"]


def _shift(x, delta, axis):
    """Shift with clamped (replicated) boundary, matching the reference's
    clamped gather indexing (regularizations.py:8-12)."""
    if delta == 1:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, None)
        edge = [slice(None)] * x.ndim
        edge[axis] = slice(-1, None)
        return jnp.concatenate([x[tuple(sl)], x[tuple(edge)]], axis=axis)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, -1)
    edge = [slice(None)] * x.ndim
    edge[axis] = slice(0, 1)
    return jnp.concatenate([x[tuple(edge)], x[tuple(sl)]], axis=axis)


def discrete_laplacian_reg(data: jnp.ndarray) -> jnp.ndarray:
    """Σ (f − mean of 6-neighborhood)²  (regularizations.py:5-25);
    default weight 1e-5 (opt_configs.py:221)."""
    if data.ndim == 4:
        data = data[..., 0]
    nb = (
        _shift(data, 1, 0) + _shift(data, -1, 0)
        + _shift(data, 1, 1) + _shift(data, -1, 1)
        + _shift(data, 1, 2) + _shift(data, -1, 2)
    )
    return jnp.sum((data - nb / 6.0) ** 2)
