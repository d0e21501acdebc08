"""Optimization layer: losses/regularizer units + a tiny end-to-end
reconstruction whose loss must decrease (the reference's own correctness
criterion — SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.opt import losses
from differentiable_sdf_rendering_tpu.opt.adam import adam_init, adam_step, simple_lr_decay
from differentiable_sdf_rendering_tpu.opt.configs import apply_cmdline_args, get_config
from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
from differentiable_sdf_rendering_tpu.opt.regularizations import discrete_laplacian_reg
from differentiable_sdf_rendering_tpu.opt.variables import SdfVariableSpec, box_sdf_grid


def test_losses_basic():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3))
    assert float(losses.l1(a, b)) == 1.0
    assert float(losses.l2(a, b)) == 1.0
    m = losses.multiscale_l1(a, b)
    assert abs(float(m) - 1.0) < 1e-6  # blur of constant image is constant


def test_box_blur_preserves_mean():
    img = jnp.arange(48.0).reshape(4, 4, 3)
    blurred = losses.box_blur_2x2(img)
    assert blurred.shape == img.shape


def test_laplacian_reg_flat_zero():
    flat = jnp.full((8, 8, 8), 0.3)
    assert float(discrete_laplacian_reg(flat)) < 1e-10
    bumpy = flat.at[4, 4, 4].add(1.0)
    assert float(discrete_laplacian_reg(bumpy)) > 0.1


def test_adam_converges_quadratic():
    params = {"x": jnp.asarray([3.0, -2.0])}
    state = adam_init(params)
    for _ in range(300):
        g = {"x": 2.0 * params["x"]}
        params, state = adam_step(params, g, state, {"x": jnp.asarray(0.1)})
    np.testing.assert_allclose(np.asarray(params["x"]), 0.0, atol=1e-2)


def test_lr_decay_schedule():
    assert float(simple_lr_decay(0.04, 0.02, 0)) == pytest.approx(0.04)
    assert float(simple_lr_decay(0.04, 0.02, 100)) == pytest.approx(0.04 / 3.0)
    assert float(simple_lr_decay(0.04, 0.02, 490)) == pytest.approx(0.04 / (1 + 0.02 * 490) / 2)


def test_box_sdf_grid_sign():
    g = np.asarray(box_sdf_grid(16))
    assert g[8, 8, 8] < 0  # center inside
    assert g[0, 0, 0] > 0  # corner outside


def test_sdf_variable_lifecycle():
    spec = SdfVariableSpec(resolution=16, upsample_iter=(2,))
    data = spec.initialize()
    assert data.shape == (8, 8, 8)
    up = spec.validate(data, 2)  # triggers upsample + redistance
    assert up.shape == (16, 16, 16)
    g = spec.validate_gradient(jnp.asarray([jnp.nan, 0.5, -0.5]))
    np.testing.assert_allclose(np.asarray(g), [0.0, 0.1, -0.1])


def test_config_two_axis_override():
    mc = get_config("warp")
    rest = apply_cmdline_args(mc, ["--learning_rate=0.01", "--spp=8", "--unknown=3"])
    assert mc.learning_rate == 0.01 and mc.spp == 8
    assert rest == ["--unknown=3"]
    oc, rest2 = get_opt_config("no-tex-12", rest)
    assert rest2 == ["--unknown=3"]
    assert oc.n_sensors == 12 and oc.batch_size == 6


def test_strided_view_batching():
    oc, _ = get_opt_config("no-tex-12")
    assert oc.sensor_indices(0) == [0, 2, 4, 6, 8, 10]
    assert oc.sensor_indices(1) == [1, 3, 5, 7, 9, 11]
    assert oc.sensor_indices(2) == [0, 2, 4, 6, 8, 10]


@pytest.mark.slow
def test_end_to_end_reconstruction_loss_decreases():
    """Tiny sphere→block reconstruction; multi-iteration loss must drop."""
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warp")
    mc.spp = 4
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("no-tex-3")
    oc.resx = oc.resy = 24
    oc.sdf_res = 16
    oc.upsample_iter = ()
    oc.use_multiscale_rendering = False
    res = optimize_shape(
        "block", oc, mc, output_dir=None, ref_spp=16, n_iter=24, target_res=32, verbose=False
    )
    losses_arr = np.asarray(res.loss_values)
    assert np.isfinite(losses_arr).all()
    # Adam steps every voxel by ±lr, so the loss may spike in the first few
    # iterations (as in the reference); it must come down over the run.
    tail = losses_arr[-4:].mean()
    assert tail < losses_arr[0] * 0.9, losses_arr
    assert tail < losses_arr.max() * 0.6, losses_arr


@pytest.mark.slow
def test_texture_joint_optimization_runs():
    """diffuse-6-style joint SDF+albedo optimization: runs, finite, albedo
    moves toward the target color."""
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warp")
    mc.spp = 4
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("diffuse-6")
    oc.resx = oc.resy = 24
    oc.sdf_res = 16
    oc.upsample_iter = ()
    oc.tex_upsample_iter = (4,)
    oc.use_multiscale_rendering = False
    oc.n_sensors = 3
    oc.batch_size = 3
    res = optimize_shape(
        "sphere", oc, mc, output_dir=None, ref_spp=16, n_iter=10, target_res=32, verbose=False
    )
    assert "albedo" in res.params
    a = np.asarray(res.params["albedo"])
    assert np.isfinite(a).all()
    assert a.shape[-1] == 3
    # values clamped to [1e-5, 1]
    assert a.min() >= 1e-5 - 1e-7 and a.max() <= 1.0 + 1e-7
    # albedo actually changed from its 0.5 init
    assert np.abs(a - 0.5).max() > 1e-3


@pytest.mark.slow
def test_multi_scene_batched():
    """vmapped multi-scene optimization advances several reconstructions in
    one program; all curves finite."""
    from differentiable_sdf_rendering_tpu.opt.multi_scene import optimize_shapes_batched

    mc = get_config("warp")
    mc.spp = 2
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("no-tex-3")
    oc.resx = oc.resy = 16
    oc.sdf_res = 8
    oc.upsample_iter = ()
    oc.use_multiscale_rendering = False
    out = optimize_shapes_batched(
        ["sphere", "block"], oc, mc, n_iter=4, ref_spp=8, target_res=16, verbose=False
    )
    assert set(out) == {"sphere", "block"}
    for name, (grid, curve) in out.items():
        assert np.isfinite(np.asarray(grid)).all()
        assert np.isfinite(curve).all()


@pytest.mark.slow
def test_multiscale_rendering_schedule_and_resume(tmp_path):
    """use_multiscale_rendering: film res doubles at the scheduled iteration;
    checkpoints restore and training resumes."""
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warp")
    mc.spp = 2
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("no-tex-3")
    oc.resx = oc.resy = 32
    oc.sdf_res = 16
    # BOTH schedules active: film res doubles at 3, grid doubles at 4 — the
    # combination that exposed the redistancing sentinel leak
    oc.upsample_iter = (4,)
    oc.use_multiscale_rendering = True
    oc.render_upsample_iter = (3,)
    oc.checkpoint_frequency = 2
    out = str(tmp_path / "run")
    assert oc.init_res == (16, 16)
    assert oc.res_at(0) == (16, 16) and oc.res_at(3) == (32, 32)

    res = optimize_shape("sphere", oc, mc, output_dir=out, ref_spp=8, n_iter=6,
                         target_res=16, verbose=False)
    assert np.isfinite(res.loss_values).all() and len(res.loss_values) == 6
    assert max(res.loss_values) < 10.0, res.loss_values  # no sentinel blowup

    res2 = optimize_shape("sphere", oc, mc, output_dir=out, ref_spp=8, n_iter=6,
                          target_res=16, verbose=False, resume_from=4)
    assert len(res2.loss_values) == 1  # iters 5..5
    assert np.isfinite(res2.loss_values).all()


@pytest.mark.slow
def test_prb_torus_shadow_reconstruction():
    """PRB end-to-end (VERDICT r1 #5): WarpPRB reconstructs on the
    torus-shadow hybrid scene (diffuse floor mesh receiving the shadow,
    reference torus-shadow-1/mirror-opt configs run through
    sdf_prb_reparam); multi-iteration loss must drop."""
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warpprb")
    mc.spp = 4
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("torus-shadow-1")
    oc.resx = oc.resy = 24
    oc.sdf_res = 16
    oc.upsample_iter = ()
    oc.render_upsample_iter = ()
    oc.use_multiscale_rendering = False
    res = optimize_shape(
        "torus-shadow", oc, mc, output_dir=None, ref_spp=8, n_iter=24,
        target_res=32, verbose=False,
    )
    losses_arr = np.asarray(res.loss_values)
    assert np.isfinite(losses_arr).all()
    tail = losses_arr[-4:].mean()
    assert tail < losses_arr[0] * 0.9, losses_arr
    # measured on this protocol: 0.736 -> ~0.48 over 24 iters
    assert tail < losses_arr.max() * 0.7, losses_arr


@pytest.mark.slow
def test_mirror_opt_reconstruction():
    """mirror-opt end-to-end: reconstruct through the static specular
    mirror (the object is seen directly AND reflected; reference
    mirror-opt-1, opt_configs.py:257-264); loss must drop."""
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warp")
    mc.spp = 4
    mc.primal_spp_mult = 2
    oc, _ = get_opt_config("mirror-opt-1")
    oc.resx = oc.resy = 24
    oc.sdf_res = 16
    oc.upsample_iter = ()
    oc.use_multiscale_rendering = False
    res = optimize_shape(
        "mirror-opt", oc, mc, output_dir=None, ref_spp=8, n_iter=24,
        target_res=32, verbose=False,
    )
    losses_arr = np.asarray(res.loss_values)
    assert np.isfinite(losses_arr).all()
    tail = losses_arr[-4:].mean()
    assert tail < losses_arr[0] * 0.9, losses_arr


def test_host_dispatch_matches_jit():
    """The host-sliced loss/grad accumulation (hq/hqq workaround for the
    90 s one-dispatch program that crashed the v5e worker — BASELINE.md r3)
    must reproduce the one-dispatch step's loss AND parameter gradients:
    same lane ids, same seeds, same cotangent chain; differences bounded by
    float accumulation order.  max_lanes is forced tiny so every view really
    is sequenced as several spp-strided slice dispatches.  (Parameters after
    several Adam steps are NOT compared: Adam's sign-like first steps
    amplify fp-order noise on near-zero gradients into +-lr flips.)"""
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full, target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF
    from differentiable_sdf_rendering_tpu.opt import shape_opt as so

    res = 16
    rig = scene_rig_full("block", ("sdf",))
    cams = regular_cameras(3, 0.0, res, res)
    sdf0 = GridSDF.create(target_sdf("sphere", 16))
    base = Scene(sdf=GridSDF.create(jnp.zeros((16, 16, 16))), bsdf=rig["bsdf"],
                 emitter=rig["emitter"], cameras=cams, mesh=rig["mesh"],
                 area_emitter=rig["area_emitter"])
    params = {"sdf": sdf0.data}
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=4)
    cfg_p = RenderConfig(integrator="sdf_direct_reparam", spp=8)
    refs = jnp.stack([
        jnp.full((res, res, 3), 0.25), jnp.full((res, res, 3), 0.5),
        jnp.full((res, res, 3), 0.75),
    ])
    vis = jnp.asarray([0, 1, 2], jnp.int32)
    seeds = jnp.asarray([3, 4, 5])
    seeds_g = jnp.asarray([7, 8, 9])
    leaves, treedef = jax.tree_util.tree_flatten(base)

    loss_j, grads_j = jax.jit(
        lambda p: so._view_batch_loss_grads(
            p, base, vis, seeds, seeds_g, refs, None, loss_name="l1",
            cfg_primal=cfg_p, cfg_grad=cfg_g, batch=3, render_chunks=1, mesh=None,
        )
    )(params)
    loss_h, grads_h = so._host_loss_grads(
        params, tuple(leaves), vis, seeds, seeds_g, refs, None,
        base_treedef=treedef, loss_name="l1", cfg_primal=cfg_p, cfg_grad=cfg_g,
        batch=3, max_lanes=(res + 4) ** 2 * 2,  # forces 2-spp-strided slices
    )

    np.testing.assert_allclose(float(loss_h), float(loss_j), rtol=1e-5)
    gj, gh = np.asarray(grads_j["sdf"]), np.asarray(grads_h["sdf"])
    scale = np.abs(gj).max()
    assert scale > 0
    np.testing.assert_allclose(gh, gj, rtol=1e-3, atol=2e-5 * scale)


def test_host_dispatch_matches_jit_textured():
    """Host-sliced loss/grads with MULTI-PARAMETER trees (sdf + albedo
    texture): the per-slice VJP must accumulate every parameter's gradient
    identically to the one-dispatch step (the hq/hqq principled configs run
    through this path)."""
    import jax
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full, target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF
    from differentiable_sdf_rendering_tpu.opt import shape_opt as so

    res = 16
    rig = scene_rig_full("sphere", ("sdf", "albedo"))
    cams = regular_cameras(2, 0.0, res, res)
    base = Scene(sdf=GridSDF.create(jnp.zeros((16, 16, 16))), bsdf=rig["bsdf"],
                 emitter=rig["emitter"], cameras=cams, mesh=rig["mesh"],
                 area_emitter=rig["area_emitter"])
    key = jax.random.PRNGKey(2)
    params = {
        "sdf": GridSDF.create(target_sdf("sphere", 16)).data,
        "albedo": jax.random.uniform(key, (8, 8, 8, 3), minval=0.2, maxval=0.8),
    }
    cfg_p = RenderConfig(integrator="sdf_direct_reparam", spp=4)
    cfg_g = RenderConfig(integrator="sdf_direct_reparam", spp=4)
    refs = jnp.stack([jnp.full((res, res, 3), 0.3), jnp.full((res, res, 3), 0.6)])
    vis = jnp.asarray([0, 1], jnp.int32)
    seeds = jnp.asarray([11, 12])
    seeds_g = jnp.asarray([21, 22])
    leaves, treedef = jax.tree_util.tree_flatten(base)

    loss_j, grads_j = jax.jit(
        lambda p: so._view_batch_loss_grads(
            p, base, vis, seeds, seeds_g, refs, None, loss_name="l1",
            cfg_primal=cfg_p, cfg_grad=cfg_g, batch=2, render_chunks=1, mesh=None,
        )
    )(params)
    loss_h, grads_h = so._host_loss_grads(
        params, tuple(leaves), vis, seeds, seeds_g, refs, None,
        base_treedef=treedef, loss_name="l1", cfg_primal=cfg_p, cfg_grad=cfg_g,
        batch=2, max_lanes=(res + 4) ** 2 * 2,
    )
    np.testing.assert_allclose(float(loss_h), float(loss_j), rtol=1e-5)
    for k in ("sdf", "albedo"):
        gj, gh = np.asarray(grads_j[k]), np.asarray(grads_h[k])
        scale = max(np.abs(gj).max(), 1e-12)
        assert np.abs(gj).max() > 0, k  # gradients actually flow
        np.testing.assert_allclose(gh, gj, rtol=1e-3, atol=2e-5 * scale, err_msg=k)
