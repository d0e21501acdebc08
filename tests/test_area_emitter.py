"""Area emitters: sampler correctness, finite-distance NEE shadow rays,
emissive-surface hits, and MIS consistency — the reference's generic scene
emitter handling (`/root/reference/python/integrators/sdf_direct_reparam.py:31,39-53`,
`plane_area` scene family, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.emitter import AreaEmitter, ConstantEmitter
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full, target_sdf
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

PANEL = AreaEmitter.create(
    corner=(0.2, 1.2, 0.2), e0=(0.6, 0.0, 0.0), e1=(0.0, 0.0, 0.6),
    radiance=(10.0, 10.0, 10.0),
)  # emits downward (e0 × e1 = -y)


def _quadrature_irradiance(panel, p, n_sub=64):
    """Reference irradiance at point p on an upward-facing Lambertian
    surface, via fine area quadrature of ∫ L cosθ_p cosθ_l / r² dA."""
    u = (np.arange(n_sub) + 0.5) / n_sub
    uu, vv = np.meshgrid(u, u, indexing="ij")
    corner = np.asarray(panel.corner)
    e0 = np.asarray(panel.e0)
    e1 = np.asarray(panel.e1)
    q = corner[None] + uu.reshape(-1, 1) * e0[None] + vv.reshape(-1, 1) * e1[None]
    nl = np.cross(e0, e1)
    area = np.linalg.norm(nl)
    nl = nl / area
    vec = q - np.asarray(p)[None]
    r = np.linalg.norm(vec, axis=-1)
    d = vec / r[:, None]
    cos_p = np.maximum(d[:, 1], 0.0)          # surface normal +y
    cos_l = np.maximum(-d @ nl, 0.0)
    L = float(np.asarray(panel.radiance)[0])
    return L * np.mean(cos_p * cos_l / r**2) * area


def test_sample_pdf_normalization():
    """E[1_{front hit}/pdf] over sampled directions = solid angle of the
    rect (the defining property of a solid-angle density)."""
    p = jnp.asarray([0.5, 0.3, 0.5])
    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    d, dist, pdf, rad = PANEL.sample_from(p, u)
    est = jnp.mean(jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-12), 0.0))
    # quadrature solid angle
    nq = 256
    uq = (jnp.arange(nq) + 0.5) / nq
    uu, vv = jnp.meshgrid(uq, uq, indexing="ij")
    q = (PANEL.corner[None] + uu.reshape(-1, 1) * PANEL.e0[None]
         + vv.reshape(-1, 1) * PANEL.e1[None])
    vec = q - p[None]
    r = jnp.linalg.norm(vec, axis=-1)
    nl, area = PANEL._normal_area
    cos_l = jnp.maximum(jnp.sum(-(vec / r[:, None]) * nl, -1), 0.0)
    omega = float(jnp.mean(cos_l / r**2) * area)
    np.testing.assert_allclose(float(est), omega, rtol=0.02)


def test_pdf_direction_matches_sampler():
    """pdf_direction_from re-evaluates the sampler's own density."""
    p = jnp.asarray([0.45, 0.25, 0.6])
    u = jax.random.uniform(jax.random.PRNGKey(1), (512, 2))
    d, dist, pdf, _ = PANEL.sample_from(p, u)
    pdf2 = PANEL.pdf_direction_from(p, d)
    m = np.asarray(pdf) > 0
    np.testing.assert_allclose(np.asarray(pdf2)[m], np.asarray(pdf)[m], rtol=1e-3)


def test_ray_hit_faces():
    o = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 2.0, 0.5]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    t_front = PANEL.ray_hit(o, d)
    t_geo = PANEL.occlude_t(o, d)
    # from below: front face visible at t=0.7; from above: geometric hit
    # only (back face dark)
    np.testing.assert_allclose(float(t_front[0]), 0.7, rtol=1e-5)
    assert not np.isfinite(float(t_front[1]))
    np.testing.assert_allclose(float(t_geo[1]), 0.8, rtol=1e-5)


def test_direct_hit_sees_panel():
    """A camera ray that reaches the panel's front face before the SDF sees
    its radiance (si.emitter(scene).eval, sdf_direct_reparam.py:31)."""
    from differentiable_sdf_rendering_tpu.models.camera import PerspectiveCamera

    # camera slightly below the panel looking straight up
    cams = regular_cameras(1, resx=8, resy=8)
    scene = Scene.create(
        create_sphere_sdf(16, radius=0.1),
        emitter=ConstantEmitter.create((0.0, 0.0, 0.0)),
        cameras=cams,
        area_emitter=PANEL,
    )
    # aim using a custom origin/target: reuse the rig but evaluate radiance
    # along explicit rays via the integrator path — render from below
    from differentiable_sdf_rendering_tpu.models.integrator import _emitted_along

    o = jnp.asarray([[0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    rad, t = _emitted_along(scene, o, d)
    np.testing.assert_allclose(np.asarray(rad)[0], [10.0, 10.0, 10.0], rtol=1e-5)
    # a ray from above sees black (opaque back face blocks the environment)
    o2 = jnp.asarray([[0.5, 2.0, 0.5]])
    d2 = jnp.asarray([[0.0, -1.0, 0.0]])
    rad2, _ = _emitted_along(scene, o2, d2)
    np.testing.assert_allclose(np.asarray(rad2)[0], [0.0, 0.0, 0.0], atol=1e-6)


def test_nee_irradiance_matches_quadrature():
    """plane_area-style scene: (a) the NEE mixture estimator at the slab's
    top-center point matches the analytic form factor exactly (validates the
    50/50 env/area mixture pdf, sample_from density, front-face gating);
    (b) the rendered image's brightest top-face pixel is consistent with it
    (unoccluded finite-distance shadow ray; a wrong maxt → self-occlusion
    → 0, a double-counted mixture → 2×)."""
    from differentiable_sdf_rendering_tpu.models.integrator import _nee_sample

    data = target_sdf("block", 32)  # slab top at y ≈ 0.62
    scene = Scene.create(
        data,
        emitter=ConstantEmitter.create((0.0, 0.0, 0.0)),
        cameras=regular_cameras(1, resx=24, resy=24),
        area_emitter=PANEL,
    )
    E = _quadrature_irradiance(PANEL, (0.5, 0.62, 0.5))
    expected = 0.8 / np.pi * E

    # (a) point probe of the estimator (no visibility term: nothing occludes)
    p = jnp.asarray([0.5, 0.6205, 0.5])
    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    d, pdf, rad, _dist = _nee_sample(scene, jnp.broadcast_to(p, (n, 3)), u)
    cos_p = jnp.maximum(d[..., 1], 0.0)
    est = jnp.mean(
        jnp.where(pdf > 0, (0.8 / np.pi) * cos_p * rad[..., 0] / jnp.maximum(pdf, 1e-12), 0.0)
    )
    np.testing.assert_allclose(float(est), expected, rtol=0.05)

    # (b) render: the camera's grazing view sees the top face near its edge,
    # where irradiance is lower than at the center — bound loosely.
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=48)
    img = np.asarray(render(scene, 0, seed=0, cfg=cfg, mode="primal"))[..., :3]
    got = img[..., 0].max()
    assert 0.4 * expected < got < 1.2 * expected, (got, expected)


def test_power_proportional_selection_cuts_variance():
    """The NEE emitter-selection mixture is power-proportional
    (`_area_select_prob`): on a plane_area-style scene with a dim ambient
    (0.05) and a bright panel (10), it must (a) strongly favor the panel and
    (b) cut the per-sample estimator variance vs the old 50/50 split at
    equal sample count, while (c) keeping the estimate unbiased."""
    from differentiable_sdf_rendering_tpu.models.integrator import (
        _area_select_prob,
        _emitted_along,
        _nee_sample,
    )

    scene = Scene.create(
        target_sdf("block", 32),
        emitter=ConstantEmitter.create((0.05, 0.05, 0.05)),
        cameras=regular_cameras(1, resx=16, resy=16),
        area_emitter=PANEL,
    )
    p_area = float(_area_select_prob(scene))
    assert p_area > 0.7, p_area  # panel power ≫ ambient power

    p = jnp.broadcast_to(jnp.asarray([0.5, 0.6205, 0.5]), (400_000, 3))
    u = jax.random.uniform(jax.random.PRNGKey(1), (400_000, 2))
    d, pdf, rad, _ = _nee_sample(scene, p, u)
    cos_p = jnp.maximum(d[..., 1], 0.0)
    samp = jnp.where(pdf > 0, cos_p * rad[..., 0] / jnp.maximum(pdf, 1e-12), 0.0)

    # hand-built 50/50 mixture estimator on the same uniforms (the old split)
    pick = u[..., 0] < 0.5
    u0 = jnp.where(pick, u[..., 0] * 2.0, (u[..., 0] - 0.5) * 2.0)
    uu = jnp.stack([u0, u[..., 1]], -1)
    d_env, _, _ = scene.emitter.sample_direction(uu)
    d_area, _, _, _ = scene.area_emitter.sample_from(p, uu)
    d5 = jnp.where(pick[..., None], d_area, d_env)
    pdf5 = 0.5 * scene.emitter.pdf_direction(d5) + 0.5 * scene.area_emitter.pdf_direction_from(p, d5)
    rad5, _ = _emitted_along(scene, p, d5)
    samp5 = jnp.where(
        pdf5 > 0, jnp.maximum(d5[..., 1], 0.0) * rad5[..., 0] / jnp.maximum(pdf5, 1e-12), 0.0
    )

    # (c) same expectation (both are unbiased estimators of the irradiance)
    np.testing.assert_allclose(float(samp.mean()), float(samp5.mean()), rtol=0.05)
    # (b) measurable variance reduction
    assert float(samp.var()) < 0.7 * float(samp5.var()), (
        float(samp.var()), float(samp5.var()))


def test_mis_consistency_plane_area():
    """NEE-only and NEE+BSDF-MIS estimators agree in expectation on the
    plane_area scene (they sample the same integral)."""
    rig = scene_rig_full("plane_area")
    scene = Scene.create(
        target_sdf("plane_area", 24),
        bsdf=rig["bsdf"], emitter=rig["emitter"],
        cameras=regular_cameras(1, resx=24, resy=24),
        area_emitter=rig["area_emitter"],
    )
    base = RenderConfig(integrator="sdf_direct_reparam", spp=64)
    img_nee = np.asarray(render(scene, 0, seed=0, cfg=base, mode="primal"))[..., :3]
    import dataclasses

    img_mis = np.asarray(
        render(scene, 0, seed=1, cfg=dataclasses.replace(base, use_mis=True), mode="primal")
    )[..., :3]
    assert abs(img_nee.mean() - img_mis.mean()) / img_nee.mean() < 0.08, (
        img_nee.mean(), img_mis.mean(),
    )


def test_area_light_gradient_finite():
    """grad-mode render of the plane_area rig yields finite, nonzero SDF
    gradients (the silhouette warp machinery composes with area lights)."""
    rig = scene_rig_full("plane_area")
    scene = Scene.create(
        target_sdf("plane_area", 16),
        bsdf=rig["bsdf"], emitter=rig["emitter"],
        cameras=regular_cameras(1, resx=16, resy=16),
        area_emitter=rig["area_emitter"],
    )
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=8)

    def f(data):
        sc = scene.replace(sdf=scene.sdf.with_data(data))
        return jnp.sum(render(sc, 0, seed=0, cfg=cfg, mode="grad")[..., :3])

    g = jax.grad(f)(scene.sdf.data)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 1e-3
