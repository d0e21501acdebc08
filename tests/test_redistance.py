"""Redistancing: eikonal property and zero-level-set preservation."""

import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.ops.initializers import voxel_centers
from differentiable_sdf_rendering_tpu.ops.redistance import redistance


def _sphere_levelset(res, scale=3.0, r=0.3):
    pts = voxel_centers(res)
    d = jnp.linalg.norm(pts - 0.5, axis=-1) - r
    return scale * d, d  # distorted level set, exact distance


def test_sphere_redistance_near_surface():
    res = 32
    phi, exact = _sphere_levelset(res)
    out = redistance(phi)
    # Near the surface (|d| < 8 voxels) the recovered distance must be
    # first-order accurate.
    mask = np.abs(np.asarray(exact)) < 8.0 / res
    err = np.abs(np.asarray(out) - np.asarray(exact))[mask]
    assert err.max() < 2.5 / res, err.max()


def test_sphere_redistance_far_field():
    res = 32
    phi, exact = _sphere_levelset(res)
    out = np.asarray(redistance(phi))
    err = np.abs(out - np.asarray(exact))
    # first-order FSM error grows with distance; allow a few voxels globally
    assert err.max() < 5.0 / res, err.max()


def test_sign_preserved():
    res = 24
    phi, _ = _sphere_levelset(res, scale=0.1)
    out = np.asarray(redistance(phi))
    assert np.all(np.sign(out) == np.sign(np.asarray(phi)))


def test_gradient_norm_near_one():
    res = 32
    phi, exact = _sphere_levelset(res, scale=7.0)
    out = np.asarray(redistance(phi))
    gz, gy, gx = np.gradient(out, 1.0 / res)
    norm = np.sqrt(gx**2 + gy**2 + gz**2)
    interior = np.abs(np.asarray(exact)) < 0.15  # away from center/corners
    assert np.median(np.abs(norm[interior] - 1.0)) < 0.05


def test_channel_dim_roundtrip():
    res = 16
    phi, _ = _sphere_levelset(res)
    out = redistance(phi[..., None])
    assert out.shape == (res, res, res, 1)


def test_corner_blob_no_sentinel_leak():
    """Regression: a shape shrunk into a corner leaves cells whose Manhattan
    distance to the interface exceeds max(res) Jacobi passes; those must be
    clamped to the far-field ceiling, never left at the 1e5 sentinel (which
    poisons the regularizer and tracer)."""
    res = 24
    pts = voxel_centers(res)
    phi = jnp.linalg.norm(pts - jnp.asarray([0.08, 0.08, 0.08]), axis=-1) - 0.05
    out = np.asarray(redistance(phi))
    assert out.max() <= 2.0 + 1e-5, out.max()
    assert np.isfinite(out).all()
    # near-surface accuracy still first-order
    exact = np.asarray(phi)
    band = np.abs(exact) < 4.0 / res
    assert np.abs(out - exact)[band].max() < 2.0 / res
