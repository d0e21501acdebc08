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


def test_tile_trace_falls_back_for_analytic_sdf():
    """Non-grid SDFs have no window table: tile param must be a no-op."""
    sph = SphereSDF.create()
    n = 64
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    a = np.asarray(sphere_trace(sph, o, d, TraceParams()))
    b = np.asarray(sphere_trace(sph, o, d, TraceParams(tile=8)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
