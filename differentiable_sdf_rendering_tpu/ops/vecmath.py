"""Small batched 3-D vector/matrix helpers shared by the tracer and warp field.

Counterpart of the reference's ``python/math_util.py`` (normalize Jacobians,
outer products, box-interior distances) plus ray/AABB intersection, all as
pure batched JAX functions over trailing-dim-3 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "dot",
    "nearest_axis_mask",
    "norm",
    "normalize",
    "normalize_with_jac",
    "normalize_sqr_with_jac",
    "outer",
    "bbox_distance_inside_d",
    "ray_bbox_intersect",
    "replace_grad",
]


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-30))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / norm(v)[..., None]


def outer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Outer product of trailing-3 vectors → (..., 3, 3)."""
    return a[..., :, None] * b[..., None, :]


def _eye_like(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), x.shape[:-1] + (3, 3))


def normalize_with_jac(x: jnp.ndarray):
    """``x/|x|`` and the Jacobian d(x/|x|)/dx (reference math_util.py:5-10)."""
    x2 = jnp.maximum(jnp.sum(x * x, axis=-1), 1e-30)
    inv_v = 1.0 / jnp.sqrt(x2)
    jac = inv_v[..., None, None] * _eye_like(x) - (inv_v / x2)[..., None, None] * outer(x, x)
    return x * inv_v[..., None], jac


def normalize_sqr_with_jac(x: jnp.ndarray):
    """``x/|x|^2`` and its Jacobian (reference math_util.py:13-17)."""
    x2 = jnp.maximum(jnp.sum(x * x, axis=-1), 1e-30)
    jac = _eye_like(x) / x2[..., None, None] - (2.0 / (x2 * x2))[..., None, None] * outer(x, x)
    return x / x2[..., None], jac


def nearest_axis_mask(min_ax: jnp.ndarray) -> jnp.ndarray:
    """One-hot (..., 3) mask of the strictly smallest axis of ``min_ax``
    (ties → zero vector), the reference's masked-assignment chain
    (math_util.py:36-39, shapes.py:159-161)."""
    mx, my, mz = min_ax[..., 0], min_ax[..., 1], min_ax[..., 2]
    ex = (mx < my) & (mx < mz)
    ey = (my < mz) & (my < mx)
    ez = (mz < mx) & (mz < my)
    return jnp.stack(
        [ex.astype(min_ax.dtype), ey.astype(min_ax.dtype), ez.astype(min_ax.dtype)],
        axis=-1,
    )


def bbox_distance_inside_d(x: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray):
    """Distance to the nearest box face from inside (clamped to 0) and its
    spatial derivative (reference math_util.py:27-41).

    Returns ``(dist (...,), dist_d (..., 3))``; the derivative picks the
    single nearest axis with strict comparisons (ties → zero vector), exactly
    like the reference's masked assignment chain.
    """
    lo = x - bmin
    hi = bmax - x
    dist = jnp.maximum(0.0, jnp.minimum(jnp.min(lo, axis=-1), jnp.min(hi, axis=-1)))

    min_ax = jnp.minimum(jnp.abs(lo), jnp.abs(hi))  # per-axis distance to nearer face
    n = nearest_axis_mask(min_ax)
    sign = jnp.sign(jnp.abs(hi) - jnp.abs(lo))
    dist_d = jnp.where((dist > 0.0)[..., None], n * sign, 0.0)
    return dist, dist_d


def ray_bbox_intersect(o: jnp.ndarray, d: jnp.ndarray, bmin, bmax):
    """Slab test. Returns ``(hit, mint, maxt)`` with safe handling of
    axis-parallel rays; mint/maxt are the entry/exit parameters (mint may be
    negative if the origin is inside)."""
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    inv_d = 1.0 / safe_d
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.0)
    return hit, tmin, tmax


def replace_grad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Value of ``a``, gradient of ``b`` — JAX idiom for ``dr.replace_grad``
    (used throughout the reference, e.g. warp.py:81,95, reparam.py:104)."""
    import jax

    return jax.lax.stop_gradient(a) + (b - jax.lax.stop_gradient(b))
