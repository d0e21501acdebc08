"""Native C++ helpers + mesh→SDF pipeline: build, oracle consistency,
icosphere SDF accuracy."""

import numpy as np
import pytest

from differentiable_sdf_rendering_tpu import native
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf, voxel_centers
from differentiable_sdf_rendering_tpu.ops.redistance import redistance
from differentiable_sdf_rendering_tpu.utils.mesh import create_sdf, icosphere


def test_native_builds():
    assert native.available(), "g++ toolchain should be present in this image"


def test_fsm_matches_jax_redistance():
    """The exact C++ FSM is the oracle for the JAX Jacobi-Godunov solver."""
    res = 24
    pts = np.asarray(voxel_centers(res))
    phi = (np.linalg.norm(pts - 0.5, axis=-1) - 0.27).astype(np.float32) * 4.0
    exact = native.fsm_redistance(phi)
    ours = np.asarray(redistance(phi))
    band = np.abs(exact) < 6.0 / res
    err = np.abs(exact - ours)[band]
    assert err.max() < 1.5 / res, err.max()


def test_mesh_occupancy_sphere():
    verts, tris = icosphere(3)
    occ = native.mesh_occupancy(verts, tris, 32)
    pts = np.asarray(voxel_centers(32))
    exact_inside = np.linalg.norm(pts - 0.5, axis=-1) < 0.3
    agree = (occ < 0) == exact_inside
    assert agree.mean() > 0.98, agree.mean()


def test_mesh_min_distance():
    verts, tris = icosphere(3)
    pts = np.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.85], [0.1, 0.5, 0.5]], np.float32)
    d = native.mesh_min_distance(verts, tris, pts)
    np.testing.assert_allclose(d, [0.3, 0.05, 0.1], atol=0.01)


def test_create_sdf_icosphere():
    verts, tris = icosphere(3)
    sdf = create_sdf((verts, tris), res=32)
    exact = np.asarray(create_sphere_sdf(32, radius=0.3))
    band = np.abs(exact) < 4.0 / 32
    err = np.abs(sdf - exact)[band]
    assert err.max() < 2.0 / 32, err.max()
