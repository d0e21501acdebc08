"""Eikonal redistancing of a level-set grid, as a pure JAX op.

TPU-native replacement for the reference's external ``fastsweep`` package
(``/root/reference/python/redistancing.py:4-13``): after every optimizer step
the SDF grid must again satisfy ``|grad f| = 1`` with an unchanged zero level
set ("valid SDF after every step" contract).

The reference uses GPU fast-sweeping (inherently sequential Gauss-Seidel
sweeps).  On TPU we instead run a *parallel Godunov-Jacobi* scheme that is
fully vectorized over the grid:

  1. freeze first-order-accurate distances in the one-ring around the zero
     crossing (sub-cell linear interpolation, combined across crossing axes),
  2. iterate the monotone Godunov upwind update ``K`` times; each iteration
     is a 6-point stencil (shifts + min + quadratic solve) on the whole grid,
     so information propagates one voxel per iteration on the VPU.

``K = max(resolution)`` reproduces the exact first-order FSM fixed point;
smaller ``K`` still yields correct distances within ``K`` voxels of the
surface (all the sphere tracer and warp weights ever consume).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["redistance"]

_BIG = 1e5
# Far-field ceiling: no point in the expanded unit cube is farther than the
# diagonal (~1.87) from any surface inside it.  Cells the Jacobi sweep has
# not reached within `iterations` passes (information travels one voxel per
# pass, so worst-case Manhattan distance ≈ 3·res for a shape shrunk into a
# corner) are clamped here instead of keeping the 1e5 sentinel — leaving
# BIG values poisons the Laplacian regularizer and the tracer.
_FAR = 2.0


def _neighbor_min(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    """min(u[i-1], u[i+1]) along ``axis`` with +inf beyond the boundary."""
    fwd = jnp.concatenate(
        [jax.lax.slice_in_dim(u, 1, u.shape[axis], axis=axis),
         jnp.full_like(jax.lax.slice_in_dim(u, 0, 1, axis=axis), _BIG)],
        axis=axis,
    )
    bwd = jnp.concatenate(
        [jnp.full_like(jax.lax.slice_in_dim(u, 0, 1, axis=axis), _BIG),
         jax.lax.slice_in_dim(u, 0, u.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    return jnp.minimum(fwd, bwd)


def _godunov_update(u: jnp.ndarray, h: tuple[float, float, float]) -> jnp.ndarray:
    """One Jacobi pass of the Godunov upwind eikonal update."""
    hz, hy, hx = h
    a = _neighbor_min(u, 0)  # z neighbors
    b = _neighbor_min(u, 1)  # y
    c = _neighbor_min(u, 2)  # x

    # Solve sum_i max((unew - a_i)/h_i, 0)^2 = 1 for the up-to-3 active axes.
    if abs(hz - hy) < 1e-12 and abs(hy - hx) < 1e-12:
        # Uniform spacing (the standard cubic grid): 3-element min/max
        # sorting network, far cheaper than argsort on the VPU.
        lo, hi = jnp.minimum(a, b), jnp.maximum(a, b)
        a1 = jnp.minimum(lo, c)
        a3 = jnp.maximum(hi, c)
        a2 = a + b + c - a1 - a3
        h1 = h2 = h3 = hx
    else:
        vals = jnp.stack([a, b, c], axis=-1)
        hs = jnp.broadcast_to(jnp.asarray([hz, hy, hx], u.dtype), vals.shape)
        order = jnp.argsort(vals, axis=-1)
        vals = jnp.take_along_axis(vals, order, axis=-1)
        hs = jnp.take_along_axis(hs, order, axis=-1)
        a1, a2, a3 = vals[..., 0], vals[..., 1], vals[..., 2]
        h1, h2, h3 = hs[..., 0], hs[..., 1], hs[..., 2]

    # 1-axis solution
    u1 = a1 + h1
    # 2-axis solution of ((u-a1)/h1)^2 + ((u-a2)/h2)^2 = 1
    w1, w2 = 1.0 / (h1 * h1), 1.0 / (h2 * h2)
    s12 = w1 + w2
    m12 = (w1 * a1 + w2 * a2) / s12
    q12 = (w1 * a1 * a1 + w2 * a2 * a2 - 1.0) / s12
    disc2 = jnp.maximum(m12 * m12 - q12, 0.0)
    u2 = m12 + jnp.sqrt(disc2)
    # 3-axis solution
    w3 = 1.0 / (h3 * h3)
    s123 = s12 + w3
    m123 = (w1 * a1 + w2 * a2 + w3 * a3) / s123
    q123 = (w1 * a1 * a1 + w2 * a2 * a2 + w3 * a3 * a3 - 1.0) / s123
    disc3 = jnp.maximum(m123 * m123 - q123, 0.0)
    u3 = m123 + jnp.sqrt(disc3)

    unew = jnp.where(u1 <= a2, u1, jnp.where(u2 <= a3, u2, u3))
    return jnp.minimum(u, unew)


def _interface_init(phi: jnp.ndarray, h: tuple[float, float, float]):
    """First-order sub-cell distances next to the zero crossing.

    For each axis with a sign change to a neighbor, the distance to the
    crossing is ``h * |phi| / |phi - phi_neighbor|``; multiple axes combine
    as distance-to-plane ``1/sqrt(sum 1/d_k^2)``.
    """
    apos = phi >= 0.0
    inv_d2 = jnp.zeros_like(phi)
    frozen = jnp.zeros(phi.shape, bool)
    for axis, ha in zip((0, 1, 2), h):
        for shift in (-1, 1):
            nb = jnp.roll(phi, shift, axis=axis)
            nb_pos = jnp.roll(apos, shift, axis=axis)
            # Exclude the wrapped boundary slice.
            idx = jnp.arange(phi.shape[axis])
            valid_line = (idx < phi.shape[axis] - 1) if shift == -1 else (idx > 0)
            shape = [1, 1, 1]
            shape[axis] = phi.shape[axis]
            valid = jnp.broadcast_to(valid_line.reshape(shape), phi.shape)
            crossing = (apos != nb_pos) & valid
            denom = jnp.abs(phi - nb)
            d = ha * jnp.abs(phi) / jnp.maximum(denom, 1e-12)
            d = jnp.maximum(d, 1e-2 * ha)  # guard exact-zero voxels
            inv_d2 = jnp.where(crossing, inv_d2 + 1.0 / (d * d), inv_d2)
            frozen = frozen | crossing
    dist = jnp.where(frozen, 1.0 / jnp.sqrt(jnp.maximum(inv_d2, 1e-20)), _BIG)
    return dist, frozen


def redistance(phi: jnp.ndarray, iterations: int | None = None, prefer_pallas: bool | None = None) -> jnp.ndarray:
    """Recompute a signed distance function with the same zero level set.

    Args:
      phi: (Z, Y, X) or (Z, Y, X, 1) level-set values (any valid level set,
        not necessarily a distance).
      iterations: Jacobi-Godunov passes; defaults to ``max(res)`` which
        reaches the FSM fixed point everywhere in the grid.
      prefer_pallas: use the VMEM-resident Pallas kernel
        (:mod:`ops.pallas_redistance`). ``None`` = auto: on the TPU backend
        for supported (≤96³ cubic) grids.

    Returns:
      Signed distance grid of the same shape/dtype.
    """
    shape3 = phi.shape[:3] if phi.ndim == 4 else phi.shape
    if prefer_pallas is None:
        prefer_pallas = (
            jax.default_backend() == "tpu"
            and len(set(shape3)) == 1
        )
    if prefer_pallas:
        from .pallas_redistance import pallas_supported, redistance_pallas

        if pallas_supported(shape3) and len(set(shape3)) == 1:
            return redistance_pallas(phi, iterations=iterations)
    squeeze = phi.ndim == 4
    if squeeze:
        phi = phi[..., 0]
    zres, yres, xres = phi.shape
    h = (1.0 / zres, 1.0 / yres, 1.0 / xres)
    if iterations is None:
        iterations = max(phi.shape)

    phi = jax.lax.stop_gradient(phi.astype(jnp.float32))
    sign = jnp.where(phi >= 0.0, 1.0, -1.0)

    dist0, frozen = _interface_init(phi, h)

    def body(_, u):
        unew = _godunov_update(u, h)
        return jnp.where(frozen, dist0, unew)

    dist = jax.lax.fori_loop(0, iterations, body, dist0)
    dist = jnp.minimum(dist, _FAR)
    out = sign * dist
    if squeeze:
        out = out[..., None]
    return out
