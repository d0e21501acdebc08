"""Interpolation core: value/grad/Hessian correctness and AD consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.ops import grid as gridops
from differentiable_sdf_rendering_tpu.ops.initializers import voxel_centers


def _linear_grid(res, coef=(0.7, -0.3, 0.2), off=0.1):
    pts = voxel_centers(res)
    a = jnp.asarray(coef)
    return jnp.sum(pts * a, axis=-1) + off, a, off


def test_bspline_partition_of_unity():
    f = jnp.linspace(0.0, 1.0, 33)
    w, dw, ddw = gridops.bspline_weights(f)
    np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.sum(np.asarray(dw), -1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.sum(np.asarray(ddw), -1), 0.0, atol=1e-5)


def test_linear_reproduction():
    """Cubic B-splines reproduce linear functions exactly (away from clamp)."""
    res = 16
    data, a, off = _linear_grid(res)
    key = jax.random.PRNGKey(0)
    # stay > 2 voxels from the boundary to avoid the clamped-tap region
    p = jax.random.uniform(key, (256, 3), minval=3.5 / res, maxval=1.0 - 3.5 / res)
    v = gridops.grid_eval(data, p)
    expected = jnp.sum(p * a, -1) + off
    np.testing.assert_allclose(np.asarray(v), np.asarray(expected), atol=1e-5)

    v2, g = gridops.grid_eval_grad(data, p)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.tile(np.asarray(a), (256, 1)), atol=1e-4)

    v3, g3, h = gridops.grid_eval_all(data, p)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=2e-3)


@pytest.fixture
def random_grid():
    key = jax.random.PRNGKey(7)
    return jax.random.normal(key, (12, 10, 14), jnp.float32) * 0.1


def test_grad_matches_autodiff(random_grid):
    p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.2, maxval=0.8)
    _, g = gridops.grid_eval_grad(random_grid, p)
    g_ad = jax.vmap(jax.grad(lambda q: gridops.grid_eval(random_grid, q)))(p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=2e-4, atol=1e-5)


def test_hessian_matches_autodiff(random_grid):
    p = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=0.2, maxval=0.8)
    _, _, h = gridops.grid_eval_all(random_grid, p)
    h_ad = jax.vmap(jax.hessian(lambda q: gridops.grid_eval(random_grid, q)))(p)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), rtol=2e-3, atol=2e-3)


def test_grid_data_gradient_finite_difference(random_grid):
    """Backward into the voxel grid (the SDF gradient hot path)."""
    p = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=0.15, maxval=0.85)

    def loss(data):
        return jnp.sum(jnp.sin(3.0 * gridops.grid_eval(data, p)))

    g = jax.grad(loss)(random_grid)
    direction = jax.random.normal(jax.random.PRNGKey(4), random_grid.shape)
    eps = 1e-3
    fd = (loss(random_grid + eps * direction) - loss(random_grid - eps * direction)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, direction)), float(fd), rtol=2e-3)


def test_batch_shapes(random_grid):
    p = jax.random.uniform(jax.random.PRNGKey(5), (4, 5, 3), minval=0.2, maxval=0.8)
    v = gridops.grid_eval(random_grid, p)
    assert v.shape == (4, 5)
    v2, g, h = gridops.grid_eval_all(random_grid, p)
    assert v2.shape == (4, 5) and g.shape == (4, 5, 3) and h.shape == (4, 5, 3, 3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)


def test_trilinear_matches_data_at_centers(random_grid):
    pts = voxel_centers(random_grid.shape).reshape(-1, 3)
    v = gridops.grid_eval_trilinear(random_grid, pts)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(random_grid).ravel(), atol=1e-6
    )


def test_stencil_path_matches_clamped(random_grid):
    """The contiguous-row stencil interpolation path (the TPU trace-loop
    fast path) is exactly the per-tap clamped path, including far-outside
    queries beyond the stencil's base-index table range."""
    from differentiable_sdf_rendering_tpu.ops.grid import build_stencil

    stencil = build_stencil(random_grid)
    p = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(9), (64, 3), minval=-0.2, maxval=1.2),
            jnp.asarray([[-3.0, 0.5, 0.5], [0.5, 4.0, 0.5], [2.5, -1.0, 3.0]]),
        ]
    )
    v0, g0, h0 = gridops.grid_eval_all(random_grid, p)
    v1, g1, h1 = gridops.grid_eval_all(random_grid, p, stencil)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-4)

    # gradients w.r.t. the grid agree through the stencil construction
    def loss(data, use_stencil):
        pp = build_stencil(data) if use_stencil else None
        return jnp.sum(jnp.sin(3.0 * gridops.grid_eval(data, p, pp)))

    ga = jax.grad(loss)(random_grid, False)
    gb = jax.grad(loss)(random_grid, True)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_prepared_sdf_render_identical():
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

    scene = Scene.create(create_sphere_sdf(16, radius=0.3), cameras=regular_cameras(2, resx=16, resy=16))
    scene_prep = scene.replace(sdf=scene.sdf.prepare())
    cfg = RenderConfig(spp=2)
    a = np.asarray(render(scene, 0, seed=0, cfg=cfg))
    b = np.asarray(render(scene_prep, 0, seed=0, cfg=cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mm_jet_matches_elementwise(random_grid, monkeypatch):
    """The MXU matmul weight formulation (grid._jet_contract_mm — the r4
    TPU lever: 164 → 11.9 ms for a standalone 262k-lane jet) must agree
    with the elementwise broadcast-product path; with Precision.HIGHEST
    the matmul is fp32-accurate on every backend."""
    p = jax.random.uniform(jax.random.PRNGKey(3), (128, 3), minval=-0.05, maxval=1.05)

    monkeypatch.setenv("DSDF_MM_JET", "0")
    v0, g0, h0 = gridops.grid_eval_all(random_grid, p)
    val0 = gridops.grid_eval(random_grid, p)
    monkeypatch.setenv("DSDF_MM_JET", "1")
    v1, g1, h1 = jax.jit(gridops.grid_eval_all)(random_grid, p)
    val1 = jax.jit(gridops.grid_eval)(random_grid, p)

    np.testing.assert_allclose(np.asarray(val0), np.asarray(val1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-3, atol=2e-2)

    # AD through the matmul form: grid-data cotangents must match too
    def loss(fn_data, env):
        monkeypatch.setenv("DSDF_MM_JET", env)
        return jax.grad(lambda d: jnp.sum(gridops.grid_eval_grad(d, p)[1] ** 2)
                        + jnp.sum(gridops.grid_eval(d, p) ** 2))(fn_data)

    gd0 = loss(random_grid, "0")
    gd1 = loss(random_grid, "1")
    np.testing.assert_allclose(np.asarray(gd0), np.asarray(gd1), rtol=1e-4, atol=1e-4)


def test_incremental_builder_matches_traceable(random_grid):
    """The eager 8-row-group incremental table builder (r4: 8 dispatches
    instead of 64 — part of the 256^3 hqq build-cost work, VERDICT r3 #5)
    is bit-identical to the traceable build_stencil."""
    t1 = gridops.build_stencil(random_grid)
    t2 = gridops.build_stencil_incremental(random_grid)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_packed_stencil_table_matches_unpacked(monkeypatch):
    """r5: 256³-class tables use the PACKED (⌈n/2⌉, 128) layout (one full
    T(8,128) tile per row — halves the padded HBM footprint; the hqq
    compile-OOM fix).  Forced here at a tiny size: eval/grad/Hessian values
    through the packed table must equal the unpacked-table and per-tap
    paths exactly."""
    import numpy as np

    from differentiable_sdf_rendering_tpu.ops import grid as gridops
    from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf

    data = create_sphere_sdf(9, radius=0.31, noise_sigma=0.02, seed=3)
    n = (9 + 3) ** 3  # odd row count exercises the pad row
    monkeypatch.setattr(gridops, "_PACK_TABLE_ROWS", 0)
    packed = gridops.build_stencil_incremental(data)
    assert packed.shape == ((n + 1) // 2, 128)
    unpacked = gridops.build_stencil(data)

    pts = jax.random.uniform(jax.random.PRNGKey(0), (257, 3), minval=-0.1,
                             maxval=1.1)
    for fn in (gridops.grid_eval, gridops.grid_eval_grad):
        a = fn(data, pts, packed)
        b = fn(data, pts, unpacked)
        c = fn(data, pts, None)
        for x, y in ((a, b), (a, c)):
            np.testing.assert_allclose(
                np.asarray(jnp.asarray(jax.tree_util.tree_leaves(x)[0])),
                np.asarray(jnp.asarray(jax.tree_util.tree_leaves(y)[0])),
                rtol=2e-6, atol=2e-6,
            )
