"""Convolution-warp baseline: silhouette gradient agrees in sign/scale with
our warp method (they estimate the same derivative)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
from differentiable_sdf_rendering_tpu.ops.warp_conv import ConvWarpConfig


@pytest.fixture(scope="module")
def scene():
    return Scene.create(
        create_sphere_sdf(32, radius=0.3), cameras=regular_cameras(4, resx=20, resy=20)
    )


def _g(scene, cfg, seed=0):
    def f(p):
        s = scene.replace(sdf=scene.sdf.replace(p=p))
        return jnp.sum(render(s, 0, seed=seed, cfg=cfg, mode="grad")[..., :3])

    return np.asarray(jax.grad(f)(jnp.zeros(3)))


def test_conv_warp_matches_ours_silhouette(scene):
    cfg_ours = RenderConfig(integrator="sdf_silhouette_reparam", spp=16)
    cfg_conv = RenderConfig(
        integrator="sdf_silhouette_reparam", spp=16, warp_kind="conv",
        conv=ConvWarpConfig(n_aux_rays=8),
    )
    g_ours = _g(scene, cfg_ours)
    g_conv = (_g(scene, cfg_conv, 0) + _g(scene, cfg_conv, 1)) / 2
    assert np.all(np.isfinite(g_conv))
    assert abs(g_ours[0]) > 30
    # Same sign and order of magnitude on the dominant axis.  The conv
    # baseline's boundary weighting overestimates curved-silhouette
    # magnitude at finite kappa (observed ~1.5x on this sphere scene,
    # stable across n_aux ∈ {8,16,32}; decreases with kappa: 2.0x @1e4,
    # 1.6x @1e5, and fp32 cancellation noise dominates @1e6) — a
    # structural finite-kappa estimator property, not an n_aux bias; the
    # paper itself presents this estimator as the inferior baseline
    # (Fig. 9), so we assert agreement only up to that factor.
    assert np.sign(g_conv[0]) == np.sign(g_ours[0])
    assert abs(g_conv[0] - g_ours[0]) / abs(g_ours[0]) < 0.9, (g_conv, g_ours)


def test_conv_primal_matches_plain(scene):
    cfg_conv = RenderConfig(
        integrator="sdf_direct_reparam", spp=4, warp_kind="conv",
        conv=ConvWarpConfig(n_aux_rays=4),
    )
    cfg_plain = RenderConfig(integrator="sdf_direct_reparam", spp=4)
    a = np.asarray(render(scene, 0, seed=0, cfg=cfg_conv, mode="grad"))
    b = np.asarray(render(scene, 0, seed=0, cfg=cfg_plain, mode="primal"))
    np.testing.assert_allclose(a, b, atol=2e-3)
