"""Aux components: 2D SDF stack + 2D tracer spec, spherical camera,
forward-gradient harness, losses blur semantics, io, profiling."""

import jax
import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.ops import sdf2d
from differentiable_sdf_rendering_tpu.models.camera import SphericalCamera
from differentiable_sdf_rendering_tpu.utils.profiling import device_time


def test_2d_trace_disk():
    disk = sdf2d.DiskSDF.create((0.5, 0.5), 0.3)
    n = 64
    o = jnp.broadcast_to(jnp.asarray([0.5, -1.0]), (n, 2))
    xs = jnp.linspace(0.1, 0.9, n)
    d = jnp.stack([xs - 0.5, jnp.full((n,), 1.5)], -1)
    res = sdf2d.trace_2d(disk, o, d)
    its = np.asarray(res["its_t"])
    # central rays hit at ~1.2 (o_y=-1, disk bottom at y=0.2)
    assert np.isfinite(its[n // 2])
    np.testing.assert_allclose(its[n // 2], 1.2, atol=5e-3)
    # warp_t finite on near-silhouette misses
    wt = np.asarray(res["warp_t"])
    miss = ~np.isfinite(its)
    assert np.isfinite(wt[miss]).sum() > 0


def test_2d_grid_matches_disk():
    n = 48
    xs = (jnp.arange(n) + 0.5) / n
    X, Y = jnp.meshgrid(xs, xs)
    data = jnp.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - 0.3
    g = sdf2d.Grid2d(data=data.astype(jnp.float32))
    pts = jax.random.uniform(jax.random.PRNGKey(0), (64, 2), minval=0.2, maxval=0.8)
    v = g.eval(pts)
    exact = jnp.linalg.norm(pts - 0.5, axis=-1) - 0.3
    np.testing.assert_allclose(np.asarray(v), np.asarray(exact), atol=5e-3)
    v2, grad, hess = g.eval_all(pts)
    g_ad = jax.vmap(jax.grad(lambda q: g.eval(q)))(pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ad), atol=1e-4)


def test_union_sdf_smooth():
    u = sdf2d.UnionSDF(a=sdf2d.DiskSDF.create((0.4, 0.5), 0.2), b=sdf2d.DiskSDF.create((0.6, 0.5), 0.2))
    pts = jnp.asarray([[0.5, 0.5], [0.0, 0.0]])
    v = np.asarray(u.eval(pts))
    assert v[0] < 0 and v[1] > 0
    _, g, h = u.eval_all(pts)
    assert np.all(np.isfinite(np.asarray(g))) and np.all(np.isfinite(np.asarray(h)))


def test_spherical_camera_roundtrip():
    cam = SphericalCamera(origin=jnp.asarray([0.5, 0.5, 0.5]), resx=64, resy=32)
    pos = jnp.asarray([[10.0, 8.0], [32.0, 16.0], [50.0, 25.0]])
    o, d = cam.sample_ray(pos)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)
    pos2, _ = cam.project(o + d * 2.0)
    np.testing.assert_allclose(np.asarray(pos2), np.asarray(pos), atol=1e-3)


def test_forward_gradient_harness():
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
    from differentiable_sdf_rendering_tpu.opt.validation import eval_forward_gradient

    scene = Scene.create(create_sphere_sdf(16, radius=0.3), cameras=regular_cameras(2, resx=16, resy=16))
    cfg = RenderConfig(integrator="sdf_silhouette_reparam", spp=8)
    img, grad_ad, _ = eval_forward_gradient(scene, cfg, axis=0, method="ad")
    _, grad_fd, _ = eval_forward_gradient(scene, cfg, axis=0, method="fd", fd_spp=128)
    assert img.shape == (16, 16, 3)
    # both concentrate on the silhouette; correlation should be high
    a, f = np.asarray(grad_ad).ravel(), np.asarray(grad_fd).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(f)
    assert denom > 0
    corr = float(np.dot(a, f) / denom)
    assert corr > 0.7, corr


def test_device_time_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    dt, out = device_time(f, jnp.ones((64,)), n_runs=2)
    assert dt >= 0 and out.shape == (64,)


def test_render_aovs():
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_aovs
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

    scene = Scene.create(create_sphere_sdf(16, radius=0.3), cameras=regular_cameras(2, resx=16, resy=16))
    aovs = render_aovs(scene, 0, seed=0, cfg=RenderConfig(spp=2))
    assert set(aovs) >= {"depth", "warp_t", "weight_sum", "i", "div", "sdf_value"}
    for k, v in aovs.items():
        assert v.shape == (16, 16), k
        assert np.isfinite(np.asarray(v)).all(), k
    assert np.asarray(aovs["depth"]).max() > 0.5  # some hits


def test_antithetic_sampling_runs():
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

    scene = Scene.create(create_sphere_sdf(16, radius=0.3), cameras=regular_cameras(2, resx=16, resy=16))
    img_a = np.asarray(render(scene, 0, seed=0, cfg=RenderConfig(spp=4, antithetic_sampling=True)))
    img_b = np.asarray(render(scene, 0, seed=0, cfg=RenderConfig(spp=4)))
    assert np.isfinite(img_a).all()
    assert np.abs(img_a - img_b).max() > 1e-6  # actually changed the estimate


def test_checkpoint_roundtrip(tmp_path):
    from differentiable_sdf_rendering_tpu.opt.shape_opt import load_checkpoint
    from differentiable_sdf_rendering_tpu.opt.variables import SdfVariableSpec
    from differentiable_sdf_rendering_tpu.utils.io import write_vol

    spec = SdfVariableSpec(resolution=8, upsample_iter=())
    data = np.random.randn(8, 8, 8).astype(np.float32)
    write_vol(str(tmp_path / "params" / "sdf-data-0004.vol"), data)
    params = load_checkpoint(str(tmp_path), 4, [spec])
    np.testing.assert_allclose(np.asarray(params["sdf"]), data, atol=1e-7)


def test_scene_file_loading(tmp_path):
    import json

    from differentiable_sdf_rendering_tpu.models.scene_file import load_scene_file
    from differentiable_sdf_rendering_tpu.utils.io import write_vol

    spec = {
        "sdf": {"vol": "grid.vol"},
        "bsdf": {"type": "principled", "base_color": [0.5, 0.5, 0.7]},
        "emitter": {"type": "constant", "radiance": [2.0, 2.0, 2.0]},
        "cameras": {"type": "lookat", "origins": [[0.5, 0.5, -1.5]], "target": [0.5, 0.5, 0.5]},
    }
    import numpy as _np

    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

    write_vol(str(tmp_path / "grid.vol"), _np.asarray(create_sphere_sdf(16)))
    with open(tmp_path / "scene.json", "w") as f:
        json.dump(spec, f)
    scene = load_scene_file(str(tmp_path / "scene.json"), resx=16, resy=16)
    assert scene.sdf.data.shape == (16, 16, 16)
    assert scene.cameras.resx == 16

    # the repo's example scene
    scene2 = load_scene_file("scenes/example/example.json", resx=24, resy=24)
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render

    img = render(scene2, 0, seed=0, cfg=RenderConfig(spp=2))
    assert np.isfinite(np.asarray(img)).all()


def test_exr_roundtrip(tmp_path):
    """write_exr emits real OpenEXR 2.0 (magic, scanline float, no
    compression; reference util.py:14-22 round-trips EXR bitmaps) and
    read_exr inverts it bit-exactly for 1/3/4-channel images."""
    import struct

    from differentiable_sdf_rendering_tpu.utils.io import read_exr, write_exr

    rng = np.random.default_rng(0)
    for nc in (1, 3, 4):
        img = rng.standard_normal((7, 5, nc)).astype(np.float32) * 1e3
        p = str(tmp_path / f"im{nc}.exr")
        write_exr(p, img)
        with open(p, "rb") as f:
            magic, version = struct.unpack("<ii", f.read(8))
        assert magic == 20000630 and version == 2
        back = read_exr(p)
        np.testing.assert_array_equal(back, img)
    # 2-D input → (H, W, 1)
    img = rng.standard_normal((4, 6)).astype(np.float32)
    p = str(tmp_path / "gray.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p)[..., 0], img)
