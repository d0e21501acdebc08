"""SDF grid initializers and upsampling schedules.

Counterparts of the reference's ``create_sphere_sdf`` / ``create_block_sdf``
(``/root/reference/python/shapes.py:557-590``) and the grid up-sampling used
by the variable lifecycle (``/root/reference/python/variables.py:18-26``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import grid as gridops
from .redistance import redistance

__all__ = [
    "voxel_centers",
    "create_sphere_sdf",
    "create_block_sdf",
    "upsample_sdf",
    "upsample_volume",
]


def voxel_centers(res) -> jnp.ndarray:
    """(Z, Y, X, 3) world positions of voxel centers in the unit cube."""
    if isinstance(res, int):
        res = (res, res, res)
    zs = (jnp.arange(res[0]) + 0.5) / res[0]
    ys = (jnp.arange(res[1]) + 0.5) / res[1]
    xs = (jnp.arange(res[2]) + 0.5) / res[2]
    z, y, x = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).astype(jnp.float32)


def create_sphere_sdf(res, center=(0.5, 0.5, 0.5), radius=0.3, noise_sigma=0.0, seed=0):
    """Sphere SDF grid (reference shapes.py:557-581).

    The reference samples the grid on a [0, 1]-inclusive lattice; we use voxel
    centers consistently with our texture convention, then redistance.
    """
    if isinstance(res, int):
        res = (res, res, res)
    pts = voxel_centers(res)
    d = jnp.linalg.norm(pts - jnp.asarray(center, jnp.float32), axis=-1) - radius
    if noise_sigma > 0:
        noise = jax.random.normal(jax.random.PRNGKey(seed), d.shape) * (noise_sigma / 4)
        d = d + noise
    return redistance(d.astype(jnp.float32))


def create_block_sdf(res, center=(0.5, 0.5, 0.5)):
    """Block occupancy → SDF (reference shapes.py:584-590)."""
    if isinstance(res, int):
        res = (res, res, res)
    r2 = res[0] // 2
    occ = np.ones(res, np.float32)
    occ[r2 - r2 // 6 : r2 + r2 // 6,
        r2 - r2 // 6 : r2 + r2 // 6,
        r2 - r2 // 2 : r2 + r2 // 2] = -1.0
    return redistance(jnp.asarray(occ))


def upsample_sdf(data: jnp.ndarray) -> jnp.ndarray:
    """Double SDF resolution via cubic B-spline resampling + redistance-free.

    Mirrors ``variables.py:18-23``: evaluate the cubic interpolant at the new
    voxel centers.  (The caller redistances afterwards as part of
    ``SdfVariable.validate``.)
    """
    if data.ndim == 4:
        data = data[..., 0]
    new_res = tuple(2 * s for s in data.shape)
    pts = voxel_centers(new_res).reshape(-1, 3)
    n = pts.shape[0]
    # Stencil-table + chunked evaluation: the one-shot per-tap eval
    # materializes an (N, 4, 4, 4) fp32 tap tensor whose T(4, 128) tiling
    # pads 32× — 16.00 GB at a 64³→128³ upsample (compile OOM observed on
    # the r5 hq warm-start; the r4 512-run's upsamples were ≤262 k queries
    # and never hit it).  The table keeps taps as (N, 64) rows (2× pad) and
    # 262 k-point chunks bound each program's transient to ~128 MB.
    st = gridops.build_stencil(data) if gridops.stencil_ok(data) else None
    chunk = 262_144
    if n <= chunk:
        return gridops.grid_eval(data, pts, st).reshape(new_res)
    outs = [
        gridops.grid_eval(data, pts[i : i + chunk], st)
        for i in range(0, n, chunk)
    ]
    return jnp.concatenate(outs).reshape(new_res)


def upsample_volume(data: jnp.ndarray) -> jnp.ndarray:
    """Double a (Z, Y, X, C) texture volume with trilinear interpolation.

    Mirrors ``dr.upsample(..., scale_factor=[2,2,2,1])`` at variables.py:25-26.
    """
    assert data.ndim == 4
    new_res = tuple(2 * s for s in data.shape[:3])
    pts = voxel_centers(new_res).reshape(-1, 3)
    chunk = 262_144  # bound per-program transients (see upsample_sdf)
    chans = [
        jnp.concatenate([
            gridops.grid_eval_trilinear(data[..., c], pts[i : i + chunk])
            for i in range(0, pts.shape[0], chunk)
        ]).reshape(new_res)
        for c in range(data.shape[-1])
    ]
    return jnp.stack(chans, axis=-1)
