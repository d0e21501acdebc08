"""PRB integrator: primal consistency with the direct integrator at depth 2,
finite gradients, boundary term vs silhouette oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf


@pytest.fixture(scope="module")
def scene():
    return Scene.create(
        create_sphere_sdf(32, radius=0.3), cameras=regular_cameras(4, resx=24, resy=24)
    )


def _set_p(scene, p):
    return scene.replace(sdf=scene.sdf.replace(p=p))


def test_prb_primal_matches_direct_depth2(scene):
    """At max_depth=2, PRB primal = direct illumination (same estimator
    family, same RNG decorrelation differs — compare means)."""
    cfg_prb = RenderConfig(integrator="sdf_prb_reparam", spp=32, max_depth=2)
    cfg_dir = RenderConfig(integrator="sdf_direct_reparam", spp=32)
    img_p = np.asarray(render(scene, 0, seed=0, cfg=cfg_prb))[..., :3]
    img_d = np.asarray(render(scene, 0, seed=1, cfg=cfg_dir))[..., :3]
    # pixel means agree within MC noise
    assert abs(img_p.mean() - img_d.mean()) < 0.03, (img_p.mean(), img_d.mean())


def test_prb_primal_indirect_adds_light(scene):
    """More bounces ⇒ more light (interreflection is non-negative)."""
    img2 = np.asarray(render(scene, 0, seed=0, cfg=RenderConfig(integrator="sdf_prb_reparam", spp=16, max_depth=2)))[..., :3]
    img4 = np.asarray(render(scene, 0, seed=0, cfg=RenderConfig(integrator="sdf_prb_reparam", spp=16, max_depth=4)))[..., :3]
    assert img4.mean() >= img2.mean() - 1e-4


def test_prb_gradient_finite_and_boundary(scene):
    """PRB black-sphere gradient ≈ −silhouette gradient (boundary only)."""
    from differentiable_sdf_rendering_tpu.models.bsdf import DiffuseBSDF

    black = scene.replace(bsdf=DiffuseBSDF.create(albedo=(0.0, 0.0, 0.0)))
    cfg = RenderConfig(integrator="sdf_prb_reparam", spp=16, max_depth=2)

    def f(p, sc, c):
        return jnp.sum(render(_set_p(sc, p), 0, seed=0, cfg=c, mode="grad")[..., :3])

    g_prb = np.asarray(jax.grad(f)(jnp.zeros(3), black, cfg))
    assert np.all(np.isfinite(g_prb))
    g_sil = np.asarray(
        jax.grad(f)(jnp.zeros(3), scene, RenderConfig(integrator="sdf_silhouette_reparam", spp=16))
    )
    assert np.abs(g_sil[0]) > 30
    np.testing.assert_allclose(g_prb, -g_sil, rtol=0.08, atol=4.0)


def test_prb_grad_mode_primal_matches(scene):
    """Regression (code review): per-vertex ratio terms must not inflate the
    grad-mode image's primal value (replace_grad(L_primal, Σ Lo_k))."""
    cfg = RenderConfig(integrator="sdf_prb_reparam", spp=8, max_depth=3)
    a = np.asarray(render(scene, 0, seed=0, cfg=cfg, mode="primal"))
    b = np.asarray(render(scene, 0, seed=0, cfg=cfg, mode="grad"))
    np.testing.assert_allclose(a, b, atol=3e-3)
