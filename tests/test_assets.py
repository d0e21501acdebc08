"""Checked-in scene assets (VERDICT r1 #8): .vol volumes produced by the
own mesh→SDF pipeline (scripts/build_assets.py; the role of the reference's
downloadable scene data, README.md:66-68) plus golden-image regression at a
fixed seed."""

import os

import numpy as np

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import ASSET_DIR, target_sdf
from differentiable_sdf_rendering_tpu.utils.io import read_exr, read_vol


def test_vol_assets_load_and_are_sdfs():
    for name in ("trefoil", "blob", "cinquefoil"):
        for res in (64,):
            data = np.asarray(target_sdf(name, res))
            assert data.shape == (res, res, res)
            inside = (data < 0).mean()
            assert 0.01 < inside < 0.5, (name, inside)
            # eikonal sanity after redistance: |grad| ~ 1 away from surface
            g = np.stack(np.gradient(data, 1.0 / res), -1)
            gm = np.linalg.norm(g, axis=-1)
            band = np.abs(data) < 0.1
            assert abs(np.median(gm[band]) - 1.0) < 0.25


def test_vol_asset_res_fallthrough():
    """A resolution with no checked-in file falls back to procedural for
    known names and raises for unknown ones."""
    import pytest

    with pytest.raises(ValueError):
        target_sdf("trefoil", 32)  # no 32^3 asset and not procedural


def test_golden_render_regression():
    """Fixed-seed primal render of the trefoil asset matches the committed
    golden EXR (freezes today's correctness per VERDICT r1 weak #8; the RNG
    is counter-based per global lane, so this is deterministic up to XLA
    accumulation-order drift)."""
    for name in ("trefoil", "blob", "cinquefoil"):
        data = target_sdf(name, 64)
        scene = Scene.create(data, cameras=regular_cameras(2, resx=64, resy=64))
        cfg = RenderConfig(integrator="sdf_direct_reparam", spp=16)
        img = np.asarray(render(scene, 0, seed=0, cfg=cfg, mode="primal"))[..., :3]
        golden = read_exr(os.path.join(ASSET_DIR, "golden", f"{name}_direct_s0.exr"))
        np.testing.assert_allclose(img, golden, atol=5e-4, rtol=1e-3)


def test_hdr_envmap_asset_loads_and_samples():
    """The checked-in equirect HDR loads through GridEnvmap.from_image
    (utils/io.read_exr wired into the emitter — the reference's image
    envmap plugin role), its importance sampler is a normalized density,
    and eval reproduces the sun direction."""
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.emitter import GridEnvmap

    path = os.path.join(ASSET_DIR, "envmaps", "studio_sky.exr")
    assert os.path.exists(path), path
    env = GridEnvmap.from_image(path)
    assert env.image.shape == (128, 256, 3)
    # pdf normalization: E[1/pdf] over importance samples = 4π
    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    d, pdf, rad = env.sample_direction(u)
    est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-12)))
    np.testing.assert_allclose(est, 4.0 * np.pi, rtol=0.05)
    # the brightest samples cluster around the sun lobe (0.8, 0.5, 0.2)
    sun = np.asarray([0.8, 0.5, 0.2])
    sun = sun / np.linalg.norm(sun)
    bright = np.asarray(rad).mean(-1) > 20.0
    assert bright.mean() > 0.05  # importance sampling concentrates on it
    cos = np.asarray(d)[bright] @ sun
    assert np.median(cos) > 0.95, np.median(cos)


def test_hdr_scene_renders_and_reconstructs():
    """A named scene lit by the image envmap ('-hdr' variant) renders
    sensibly and a tiny optimization on it reduces the loss (VERDICT r2 #9
    done-criterion)."""
    import dataclasses

    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full
    from differentiable_sdf_rendering_tpu.models.emitter import GridEnvmap
    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    rig = scene_rig_full("bunny-hdr")
    assert isinstance(rig["emitter"], GridEnvmap)
    scene = Scene.create(
        target_sdf("bunny-hdr", 32), bsdf=rig["bsdf"], emitter=rig["emitter"],
        cameras=regular_cameras(1, resx=32, resy=32),
    )
    img = np.asarray(render(scene, 0, seed=0,
                            cfg=RenderConfig(integrator="sdf_direct_reparam", spp=16)))
    assert np.isfinite(img).all() and img[..., :3].max() > 0.2

    # ≥24 iterations (CLAUDE.md convergence-test rule: Adam steps every
    # voxel ±lr, early iterations can spike) and compare averaged windows —
    # the bright HDR sun makes single-iteration losses noisy at low spp
    opt_cfg, _ = get_opt_config("no-tex-3", ["--resx=32", "--resy=32", "--batch_size=3"])
    opt_cfg = dataclasses.replace(opt_cfg, sdf_res=16, upsample_iter=())
    mc = dataclasses.replace(get_config("warp"), spp=12, primal_spp_mult=2, n_iter=24)
    res = optimize_shape("bunny-hdr", opt_cfg, mc, output_dir=None, ref_spp=48,
                         target_res=32, n_iter=24, verbose=False)
    start = float(np.mean(res.loss_values[:3]))
    end = float(np.mean(res.loss_values[-4:]))
    assert end < 0.85 * start, res.loss_values
