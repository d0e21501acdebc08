"""Pallas TPU kernel for eikonal redistancing (the per-iteration hot op).

The XLA formulation in :mod:`ops.redistance` materializes ~7 full-grid
temporaries in HBM per Jacobi-Godunov iteration (6 neighbor shifts + the
update), i.e. O(iterations · res³) HBM traffic.  Since every optimization
step redistances the SDF (reference contract: "valid SDF after every
step"), this is a standing bandwidth tax.

This kernel keeps the ENTIRE grid resident in VMEM (three fp32 buffers;
fits up to ~96³ within the ~16 MiB/core budget — 64³, the optimization's
pre-upsample resolution, is the sweet spot) and runs all iterations inside one
``pallas_call``: HBM traffic drops to one read + one write of the grid
total.  The per-iteration body is the same monotone Godunov upwind update,
vectorized over (res, res) slabs on the VPU; neighbor shifts become
in-VMEM ``jnp.concatenate``/slice ops.

Numerics are identical to :func:`ops.redistance.redistance` (same
interface freeze, same sorted three-axis quadratic solve for the uniform-
spacing case); ``tests/test_pallas_redistance.py`` asserts equality in
interpret mode and the device path is validated on TPU by the benchmarks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .redistance import _FAR, _interface_init

__all__ = ["redistance_pallas", "pallas_supported"]

_BIG = 1e5


def pallas_supported(shape) -> bool:
    """Whole-grid-in-VMEM strategy: three fp32 grid buffers ≤ ~12 MiB."""
    z, y, x = shape[-3], shape[-2], shape[-1]
    return z * y * x * 4 * 3 <= 12 * 1024 * 1024 and x >= 8 and y >= 8


def _shift_min(u, axis, big):
    """min(u[i-1], u[i+1]) along ``axis`` with +BIG beyond the boundary."""
    lead = jnp.full_like(jax.lax.slice_in_dim(u, 0, 1, axis=axis), big)
    fwd = jnp.concatenate([jax.lax.slice_in_dim(u, 1, u.shape[axis], axis=axis), lead], axis=axis)
    bwd = jnp.concatenate([lead, jax.lax.slice_in_dim(u, 0, u.shape[axis] - 1, axis=axis)], axis=axis)
    return jnp.minimum(fwd, bwd)


def _godunov_iteration(u, frozen, dist0, h):
    """One Jacobi pass (uniform spacing) — mirrors redistance._godunov_update."""
    a = _shift_min(u, 0, _BIG)
    b = _shift_min(u, 1, _BIG)
    c = _shift_min(u, 2, _BIG)
    lo, hi = jnp.minimum(a, b), jnp.maximum(a, b)
    a1 = jnp.minimum(lo, c)
    a3 = jnp.maximum(hi, c)
    a2 = a + b + c - a1 - a3

    u1 = a1 + h
    w = 1.0 / (h * h)
    s12 = 2.0 * w
    m12 = (a1 + a2) * 0.5
    q12 = (w * (a1 * a1 + a2 * a2) - 1.0) / s12
    u2 = m12 + jnp.sqrt(jnp.maximum(m12 * m12 - q12, 0.0))
    s123 = 3.0 * w
    m123 = (a1 + a2 + a3) / 3.0
    q123 = (w * (a1 * a1 + a2 * a2 + a3 * a3) - 1.0) / s123
    u3 = m123 + jnp.sqrt(jnp.maximum(m123 * m123 - q123, 0.0))

    unew = jnp.where(u1 <= a2, u1, jnp.where(u2 <= a3, u2, u3))
    unew = jnp.minimum(u, unew)
    return jnp.where(frozen, dist0, unew)


def _kernel(dist0_ref, frozen_ref, sign_ref, out_ref, *, iterations: int, h: float, far: float = _FAR):
    dist0 = dist0_ref[:]
    frozen = frozen_ref[:] > 0.5

    def body(_, u):
        return _godunov_iteration(u, frozen, dist0, h)

    u = jax.lax.fori_loop(0, iterations, body, dist0)
    out_ref[:] = sign_ref[:] * jnp.minimum(u, far)


def redistance_pallas(phi: jnp.ndarray, iterations: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """VMEM-resident eikonal redistancing; same semantics as
    :func:`ops.redistance.redistance` for uniform cubic grids ≤96³."""
    squeeze = phi.ndim == 4
    if squeeze:
        phi = phi[..., 0]
    assert pallas_supported(phi.shape), phi.shape
    zres, yres, xres = phi.shape
    assert zres == yres == xres, "uniform cubic grids only"
    h = 1.0 / xres
    if iterations is None:
        iterations = xres

    phi = jax.lax.stop_gradient(phi.astype(jnp.float32))
    sign = jnp.where(phi >= 0.0, 1.0, -1.0)
    dist0, frozen = _interface_init(phi, (h, h, h))

    # The iteration body materializes ~15 grid-sized temporaries (shifts +
    # quadratic-solve intermediates); the default 16 MiB scoped-VMEM budget
    # overflows at 64³, so raise it proportionally (v5e has 128 MiB VMEM;
    # 32 MiB suffices at 64³, measured).
    grid_bytes = phi.size * 4
    vmem_limit = int(min(100 * 1024 * 1024, max(32 * 1024 * 1024, 18 * grid_bytes)))
    out = pl.pallas_call(
        functools.partial(_kernel, iterations=int(iterations), h=float(h)),
        out_shape=jax.ShapeDtypeStruct(phi.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(dist0, frozen.astype(jnp.float32), sign)

    if squeeze:
        out = out[..., None]
    return out
