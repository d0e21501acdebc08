"""Film splat: the scatter-free pixel-major path must match the generic
scatter path (values and position gradients).

The dense path (ops/film.splat_pixel_major) re-orders the accumulation
(per-pixel 6x6 windows + 36 overlap-adds instead of 16 scatter rows per
sample), so comparisons are allclose, not bit-equal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentiable_sdf_rendering_tpu.ops.film import (
    BORDER,
    develop,
    splat,
    splat_pixel_major,
)


def _wavefront(key, h, w, spp, off_pix=0, border=BORDER):
    """Pixel-major jittered wavefront over padded pixels [off_pix, ...)."""
    ph, pw = h + 2 * border, w + 2 * border
    n_pix = ph * pw - off_pix
    m = n_pix * spp
    lane = jnp.arange(m, dtype=jnp.uint32) + jnp.uint32(off_pix * spp)
    pix = lane // spp
    px = (pix % pw).astype(jnp.float32) - border
    py = (pix // pw).astype(jnp.float32) - border
    k1, k2 = jax.random.split(key)
    jit = jax.random.uniform(k1, (m, 2))
    pos = jnp.stack([px + jit[:, 0], py + jit[:, 1]], -1)
    values = jax.random.uniform(k2, (m, 5))
    return pix, pos, values


@pytest.mark.parametrize("spp", [1, 4])
def test_dense_matches_scatter(spp):
    h = w = 12
    pix, pos, values = _wavefront(jax.random.PRNGKey(0), h, w, spp)
    a = splat(pos, values, h, w)
    b = splat_pixel_major(pix, pos, values, h, w, spp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6)


def test_dense_matches_scatter_with_active():
    h = w = 9
    spp = 4
    pix, pos, values = _wavefront(jax.random.PRNGKey(1), h, w, spp)
    act = jax.random.uniform(jax.random.PRNGKey(2), (pos.shape[0],)) > 0.3
    a = splat(pos, values, h, w, active=act)
    b = splat_pixel_major(pix, pos, values, h, w, spp, active=act)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6)


def test_dense_unaligned_contiguous_groups():
    """off % spp != 0: groups straddle two adjacent pixels; the 6x6 window
    anchored at the group's first lane still covers both supports."""
    h = w = 8
    spp = 4
    border = BORDER
    pw = w + 2 * border
    # start mid-pixel, mid-row (no film-row straddle at a group boundary)
    off_lane = 2 + spp * (pw + 3)
    ph = h + 2 * border
    m = ((ph * pw * spp - off_lane) // spp) * spp
    lane = jnp.arange(m, dtype=jnp.uint32) + jnp.uint32(off_lane)
    pix = lane // spp
    px = (pix % pw).astype(jnp.float32) - border
    py = (pix // pw).astype(jnp.float32) - border
    jit = jax.random.uniform(jax.random.PRNGKey(3), (m, 2))
    pos = jnp.stack([px + jit[:, 0], py + jit[:, 1]], -1)
    values = jax.random.uniform(jax.random.PRNGKey(4), (m, 3))
    # drop trailing lanes whose group would straddle a film-ROW boundary
    # (documented limitation of the unaligned case)
    g0 = pix[::spp]
    row_straddle = np.asarray((g0 % pw) == (pw - 1))
    keep = ~np.repeat(row_straddle, spp)
    act = jnp.asarray(keep)
    a = splat(pos, values, h, w, active=act)
    b = splat_pixel_major(pix, pos, values, h, w, spp, active=act)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6)


def test_dense_position_gradients_match():
    """Attached-position gradients (the silhouette-gradient carrier in grad
    mode) must match the scatter path's."""
    h = w = 6
    spp = 2
    pix, pos, values = _wavefront(jax.random.PRNGKey(5), h, w, spp)
    ramp = jax.random.normal(jax.random.PRNGKey(6), (h + 2 * BORDER, w + 2 * BORDER, 5))

    def loss_scatter(p):
        return jnp.sum(splat(p, values, h, w) * ramp)

    def loss_dense(p):
        return jnp.sum(splat_pixel_major(pix, p, values, h, w, spp) * ramp)

    ga = jax.grad(loss_scatter)(pos)
    gb = jax.grad(loss_dense)(pos)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_render_dense_vs_scatter_splat():
    """End-to-end: render() with dense_splat on/off agrees (primal + grad)."""
    import dataclasses

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf

    scene = Scene.create(
        target_sdf("bunny", 16), cameras=regular_cameras(1, resx=24, resy=24)
    )
    cfg = RenderConfig(spp=4)
    img_d = render(scene, 0, seed=3, cfg=cfg, mode="primal")
    img_s = render(scene, 0, seed=3, cfg=dataclasses.replace(cfg, dense_splat=False),
                   mode="primal")
    np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_s), rtol=1e-5, atol=1e-5)

    def loss(data, dense):
        sc = scene.replace(sdf=scene.sdf.with_data(data))
        c = dataclasses.replace(cfg, dense_splat=dense)
        img = render(sc, 0, seed=3, cfg=c, mode="grad")
        return jnp.sum(img[..., :3])

    gd = jax.grad(loss)(scene.sdf.data, True)
    gs = jax.grad(loss)(scene.sdf.data, False)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs), rtol=5e-4, atol=1e-6)
