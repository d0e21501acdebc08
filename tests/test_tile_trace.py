"""Tile-shared window trace (TraceParams.tile) vs the per-lane stencil path.

The tile path steps a pixel's spp samples in lockstep at the tile-min
distance bound — a valid (conservative) sphere trace, so hit/miss and the
refined intersection t agree with the per-lane path up to the epsilon
shell, except on a measure-zero set of grazing rays."""

import jax
import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
from differentiable_sdf_rendering_tpu.ops.grid import (
    build_window,
    window_base_setup,
    window_eval_value,
)
from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF, SphereSDF, TraceParams
from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace


def _rays(res=48, spp=8, grid=32):
    sdf = GridSDF.create(target_sdf("bunny", grid))
    cam = regular_cameras(1, resx=res, resy=res).view(0)
    n = res * res * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pix = lane // spp
    # jittered positions WITHIN each pixel: the tile-coherence contract
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    pos = jnp.stack(
        [(pix % res).astype(jnp.float32) + u[:, 0],
         (pix // res).astype(jnp.float32) + u[:, 1]], -1,
    )
    o, d = cam.sample_ray(pos)
    return sdf, o, d, spp


def test_window_eval_matches_stencil_eval():
    """window_eval_value must reproduce sdf.eval exactly (same taps)."""
    sdf = GridSDF.create(target_sdf("bunny", 24)).prepare()
    win = build_window(sdf.data)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-0.1, maxval=1.1)
    want = np.asarray(sdf.eval(x))

    b, f = window_base_setup(sdf.data, x)
    # shared window base: shift each lane's base by a pseudo-random tile
    # offset in [0,3] to exercise every shift
    dims = jnp.asarray(sdf.data.shape[::-1], jnp.int32)
    o_off = (jnp.arange(512)[:, None] * jnp.asarray([1, 2, 3])) % 4
    B = jnp.clip(b - o_off, -2, dims)
    off = b - B
    zr, yr, xr = sdf.data.shape
    lin = ((B[:, 2] + 2) * (yr + 3) + (B[:, 1] + 2)) * (xr + 3) + (B[:, 0] + 2)
    rows = jnp.take(win, lin, axis=0)
    got = np.asarray(window_eval_value(rows, off, f))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tile_trace_matches_per_lane():
    sdf, o, d, spp = _rays()
    t_ref = np.asarray(sphere_trace(sdf, o, d, TraceParams()))
    t_til = np.asarray(sphere_trace(sdf, o, d, TraceParams(tile=spp)))

    hit_ref = np.isfinite(t_ref)
    hit_til = np.isfinite(t_til)
    # hit/miss flips only on grazing rays
    flips = np.mean(hit_ref != hit_til)
    assert flips < 0.01, f"hit/miss flip rate {flips:.4f}"
    both = hit_ref & hit_til
    if both.any():
        # refined t converges to the same epsilon shell
        err = np.abs(t_ref[both] - t_til[both])
        assert np.quantile(err, 0.99) < 5e-3, np.quantile(err, [0.5, 0.99])
        assert np.median(err) < 5e-4


def test_tile_trace_respects_maxt_and_active():
    sdf, o, d, spp = _rays(res=24, spp=4)
    n = o.shape[0]
    act = (jnp.arange(n) % 3) != 0
    maxt = jnp.full((n,), 2.2)
    t_ref = np.asarray(sphere_trace(sdf, o, d, TraceParams(), maxt=maxt, active=act))
    t_til = np.asarray(
        sphere_trace(sdf, o, d, TraceParams(tile=spp), maxt=maxt, active=act)
    )
    assert not np.isfinite(t_til[::3]).any()  # inactive lanes never hit
    agree = np.mean(np.isfinite(t_ref) == np.isfinite(t_til))
    assert agree > 0.99


def test_warp_tile_trace_is_estimator_exact():
    """The tiled warp trace keeps FREE per-lane stepping (lanes that leave
    the shared window escalate to a per-lane retrace), so every consumed
    accumulator must match the per-lane path almost exactly — unlike the
    non-diff tile trace, no trajectory change is allowed here (quadrature
    node placement shifts weight_sum and with it the estimator)."""
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace_warp

    sdf, o, d, spp = _rays(res=32, spp=8)
    r0 = sphere_trace_warp(sdf, o, d, TraceParams())
    r1 = sphere_trace_warp(sdf, o, d, TraceParams(tile=spp))
    for name, tol in [
        ("its_t", 1e-5), ("warp_t", 1e-4), ("warp_weight", 1e-3),
        ("warp_t_d", 0.05), ("warp_weight_d", 0.05),
    ]:
        a, b = np.asarray(getattr(r0, name)), np.asarray(getattr(r1, name))
        fa, fb = np.isfinite(a), np.isfinite(b)
        assert (fa == fb).all(), name
        diff = np.abs(np.where(fa, a, 0.0) - np.where(fb, b, 0.0))
        assert diff.max() < tol, (name, float(diff.max()))


def test_warp_tile_gradients_match():
    """End-to-end AD gradient with tile_primary on vs off (same seeds):
    the tile path must not change the estimator."""
    import dataclasses

    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene

    scene = Scene.create(
        target_sdf("bunny", 32), cameras=regular_cameras(1, resx=32, resy=32)
    )
    ramp = jnp.linspace(0.0, 1.0, 32)[None, :, None]

    def loss(shift, tile):
        sc = scene.replace(sdf=scene.sdf.replace(p=jnp.asarray([shift, 0.0, 0.0])))
        img = render(sc, 0, seed=2, cfg=RenderConfig(spp=4, tile_primary=tile),
                     mode="grad")
        return jnp.sum(img[..., :3] * ramp)

    g0 = float(jax.grad(loss)(0.0, 0))
    g1 = float(jax.grad(loss)(0.0, 4))
    assert abs(g1 - g0) <= 1e-3 * max(abs(g0), 1e-6), (g0, g1)


def test_tile_trace_falls_back_for_analytic_sdf():
    """Non-grid SDFs have no window table: tile param must be a no-op."""
    sph = SphereSDF.create()
    n = 64
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    a = np.asarray(sphere_trace(sph, o, d, TraceParams()))
    b = np.asarray(sphere_trace(sph, o, d, TraceParams(tile=8)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
