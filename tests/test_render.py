"""Renderer: primal sanity + the reference's gradient-correctness oracle
(forward/FD gradients w.r.t. the SDF translation ``sdf.p``,
figures/result_utils.py:126-161) applied to full renders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.emitter import ConstantEmitter, VMFEmitter
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF

RES = 32  # film res for tests
GRID = 32


@pytest.fixture(scope="module")
def sphere_scene():
    data = create_sphere_sdf(GRID, radius=0.3)
    return Scene.create(data, cameras=regular_cameras(4, resx=RES, resy=RES))


def _set_p(scene, p):
    return scene.replace(sdf=scene.sdf.replace(p=p))


def test_silhouette_primal(sphere_scene):
    cfg = RenderConfig(integrator="sdf_silhouette_reparam", spp=4)
    img = np.asarray(render(sphere_scene, 0, seed=0, cfg=cfg))
    assert img.shape == (RES, RES, 4)
    rgb = img[..., :3]
    assert rgb.min() >= -1e-5 and rgb.max() <= 1.0 + 1e-5
    cov = rgb[..., 0].mean()
    # sphere r=0.3 at distance 2, fov 39°: silhouette ≈ π·(r/(dist·tan(fov/2)))²/4 ≈ 0.14
    assert 0.08 < cov < 0.25, cov


def test_grad_mode_primal_match(sphere_scene):
    cfg = RenderConfig(integrator="sdf_silhouette_reparam", spp=4)
    img_p = np.asarray(render(sphere_scene, 0, seed=0, cfg=cfg, mode="primal"))
    img_g = np.asarray(render(sphere_scene, 0, seed=0, cfg=cfg, mode="grad"))
    np.testing.assert_allclose(img_p, img_g, atol=2e-3)


def test_direct_primal_background(sphere_scene):
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=4)
    img = np.asarray(render(sphere_scene, 0, seed=0, cfg=cfg))
    # corner pixels see the constant envmap (radiance 1)
    assert abs(img[0, 0, 0] - 1.0) < 1e-3
    assert img[..., :3].min() >= -1e-5
    # center sees the lit sphere (diffuse albedo 0.8 under uniform light ≈ 0.8·visibility)
    c = img[RES // 2, RES // 2, 0]
    assert 0.2 < c < 1.0, c


@pytest.mark.parametrize("integrator", ["sdf_silhouette_reparam"])
def test_gradient_matches_fd(sphere_scene, integrator):
    """THE correctness oracle: AD gradient of the (reparameterized) render
    w.r.t. sdf.p vs central finite differences of the primal render.

    FD of MC-sampled coverage is itself noisy (the reference uses 8192 spp
    for its FD branch, result_utils.py:147); we use high-spp FD + larger ε
    and only check the dominant (camera-axis) component.
    """
    small = regular_cameras(4, resx=24, resy=24)
    scene = sphere_scene.replace(cameras=small)
    cfg_ad = RenderConfig(integrator=integrator, spp=48)
    cfg_fd = RenderConfig(integrator=integrator, spp=256)

    def primal_sum(p, seed):
        img = render(_set_p(scene, p), 0, seed=seed, cfg=cfg_fd, mode="primal")
        return jnp.sum(img[..., :3])

    def grad_sum(p, seed):
        img = render(_set_p(scene, p), 0, seed=seed, cfg=cfg_ad, mode="grad")
        return jnp.sum(img[..., :3])

    p0 = jnp.zeros(3)
    eps = 5e-3
    n_seeds = 2
    g_ad = np.zeros(3)
    fd = np.zeros(3)
    for seed in range(n_seeds):
        g_ad += np.asarray(jax.grad(grad_sum)(p0, seed)) / n_seeds
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            fd[k] += float(
                primal_sum(jnp.asarray(dp), seed) - primal_sum(jnp.asarray(-dp), seed)
            ) / (2 * eps * n_seeds)

    assert np.all(np.isfinite(g_ad))
    # camera 0 looks along -x: the dominant component is x
    assert np.abs(fd[0]) > 1.0, (fd, g_ad)
    rel = abs(g_ad[0] - fd[0]) / abs(fd[0])
    assert rel < 0.2, (fd, g_ad)
    # non-dominant components must at least not explode
    assert np.all(np.abs(g_ad[1:]) < 0.6 * np.abs(fd[0])), (fd, g_ad)


def test_direct_boundary_gradient_black_sphere(sphere_scene):
    """Direct-integrator boundary term: a black (albedo-0) sphere on a unit
    envmap has gradient exactly −(silhouette gradient) — pure boundary, no
    shading noise.  Validates the det/attached-film pairing of the direct
    integrator against the FD-validated silhouette machinery."""
    from differentiable_sdf_rendering_tpu.models.bsdf import DiffuseBSDF

    small = regular_cameras(4, resx=24, resy=24)
    black = sphere_scene.replace(
        cameras=small, bsdf=DiffuseBSDF.create(albedo=(0.0, 0.0, 0.0))
    )
    sil = sphere_scene.replace(cameras=small)

    def gsum(scene, integrator, seed):
        cfg = RenderConfig(integrator=integrator, spp=32)

        def f(p):
            return jnp.sum(render(_set_p(scene, p), 0, seed=seed, cfg=cfg, mode="grad")[..., :3])

        return np.asarray(jax.grad(f)(jnp.zeros(3)))

    g_direct = gsum(black, "sdf_direct_reparam", 0)
    g_sil = gsum(sil, "sdf_silhouette_reparam", 0)
    assert np.abs(g_sil[0]) > 50
    np.testing.assert_allclose(g_direct, -g_sil, rtol=0.05, atol=3.0)


def test_direct_interior_pathwise_gradient(sphere_scene):
    """Interior shading gradients (normals, implicit-depth, NEE) are a
    *pathwise* derivative: with frozen seeds, warp off (shading-only mode)
    and no hit/miss flips, AD must match FD of the very same sampled
    function on an interior pixel crop."""
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=16, use_warp=False)
    small = regular_cameras(4, resx=24, resy=24)
    scene = sphere_scene.replace(cameras=small)
    c0, c1 = 9, 15  # central crop: all-hit pixels for |p| ≤ eps

    def f(p, seed):
        img = render(_set_p(scene, p), 0, seed=seed, cfg=cfg, mode="grad")
        return jnp.sum(img[c0:c1, c0:c1, :3])

    eps = 1e-4
    for seed in (0, 1):
        g_ad = np.asarray(jax.grad(f)(jnp.zeros(3), seed))
        fd = np.zeros(3)
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            fd[k] = (float(f(jnp.asarray(dp), seed)) - float(f(jnp.asarray(-dp), seed))) / (2 * eps)
        denom = max(np.abs(fd).max(), 1.0)
        np.testing.assert_allclose(g_ad, fd, atol=0.08 * denom)


def test_vmf_emitter_render(sphere_scene):
    scene = sphere_scene.replace(emitter=VMFEmitter.create())
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=8)
    img = np.asarray(render(scene, 1, seed=0, cfg=cfg))
    assert np.all(np.isfinite(img))
    assert img[..., :3].max() > 0.05


def test_render_views_differ(sphere_scene):
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=2)
    scene = sphere_scene.replace(emitter=VMFEmitter.create())
    img0 = np.asarray(render(scene, 0, seed=0, cfg=cfg))
    img2 = np.asarray(render(scene, 2, seed=0, cfg=cfg))
    assert np.abs(img0 - img2).max() > 1e-3
