"""Multi-device sharding on the virtual 8-device CPU mesh: sharded renders
must be bit-identical to single-device, and the full sharded train step must
compile and run (the driver's dryrun_multichip contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
from differentiable_sdf_rendering_tpu.parallel.sharding import make_mesh, render_sharded


@pytest.fixture(scope="module")
def scene():
    return Scene.create(
        create_sphere_sdf(16, radius=0.3), cameras=regular_cameras(4, resx=16, resy=16)
    )


def test_devices_available():
    assert len(jax.devices()) >= 8, jax.devices()


def test_sharded_render_matches_single(scene):
    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=8)
    mesh = make_mesh(n_views_axis=1)
    img_single = np.asarray(render(scene, 0, seed=0, cfg=cfg))
    img_sharded = np.asarray(
        render_sharded(scene, scene.cameras.view(0), 0, cfg, mesh, mode="primal")
    )
    np.testing.assert_allclose(img_single, img_sharded, atol=1e-5)


def test_sharded_render_views_axis(scene):
    """2×4 mesh: rays axis is 4-wide; result still identical."""
    cfg = RenderConfig(integrator="sdf_silhouette_reparam", spp=4)
    mesh = make_mesh(n_views_axis=2)
    img_single = np.asarray(render(scene, 1, seed=3, cfg=cfg))
    img_sharded = np.asarray(
        render_sharded(scene, scene.cameras.view(1), 3, cfg, mesh, mode="primal")
    )
    np.testing.assert_allclose(img_single, img_sharded, atol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_view_grads(scene):
    """The view-DP helper: loss+grads psum over the 'views' axis matches the
    unsharded sum."""
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.parallel.sharding import sharded_view_grads

    cfg = RenderConfig(integrator="sdf_silhouette_reparam", spp=2)

    def lg(params, vidx):
        def f(p):
            sc = scene.replace(sdf=scene.sdf.replace(data=p["sdf"]))
            cam = scene.cameras.view(vidx)
            img = render(sc, seed=0, cfg=cfg, mode="grad", camera=cam)
            return jnp.sum(img[..., :3])

        l, g = jax.value_and_grad(f)({"sdf": params["sdf"]})
        return l, g

    params = {"sdf": scene.sdf.data}
    mesh = make_mesh(n_views_axis=2)
    with mesh:
        loss_sh, grads_sh = sharded_view_grads(lg, params, [0, 1, 2, 3], mesh)

    loss_ref = 0.0
    grad_ref = jnp.zeros_like(params["sdf"])
    for v in range(4):
        l, g = lg(params, v)
        loss_ref += l
        grad_ref = grad_ref + g["sdf"]
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads_sh["sdf"]), np.asarray(grad_ref), atol=1e-4)
