"""Pallas eikonal kernel vs the XLA reference solver (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.ops.initializers import voxel_centers
from differentiable_sdf_rendering_tpu.ops.pallas_redistance import (
    pallas_supported,
    redistance_pallas,
)
from differentiable_sdf_rendering_tpu.ops.redistance import redistance


def test_supported_sizes():
    assert pallas_supported((64, 64, 64))
    assert pallas_supported((96, 96, 96))
    assert not pallas_supported((128, 128, 128))
    assert not pallas_supported((256, 256, 256))


def test_matches_xla_solver():
    res = 24
    pts = voxel_centers(res)
    phi = (jnp.linalg.norm(pts - 0.5, axis=-1) - 0.28) * 3.0
    a = np.asarray(redistance(phi, iterations=24))
    b = np.asarray(redistance_pallas(phi, iterations=24, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_channel_dim_and_signs():
    res = 16
    pts = voxel_centers(res)
    phi = ((jnp.linalg.norm(pts - 0.5, axis=-1) - 0.3) * 0.2)[..., None]
    out = np.asarray(redistance_pallas(phi, interpret=True))
    assert out.shape == (res, res, res, 1)
    assert np.all(np.sign(out) == np.sign(np.asarray(phi)))
