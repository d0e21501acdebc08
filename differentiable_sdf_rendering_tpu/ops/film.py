"""Differentiable film: gaussian reconstruction-filter splatting.

TPU-native replacement for Mitsuba's ImageBlock/hdrfilm pipeline as used by
the reference (``/root/reference/python/integrators/reparam.py:82-118,
159-185`` and the gaussian ``rfilter`` with ``sample_border=True`` from
``util.py:115-138``): per-sample values are scatter-added into the image with
filter weights evaluated at the *attached* splat position, so moving
silhouettes propagate gradients through the filter weights; ``develop``
divides by the accumulated weight channel, whose per-sample value is the
(primal-1) reparameterization determinant — Mitsuba's weight-channel
normalization with attached gradients.

Filter: truncated gaussian, σ = 0.5, radius 2 (Mitsuba's default
``gaussian`` rfilter), weights offset to reach zero at the radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "FILTER_RADIUS", "BORDER", "gaussian_weight", "splat",
    "splat_pixel_major", "develop",
]

FILTER_RADIUS = 2.0
BORDER = 2  # ceil(radius): padding when sample_border=True
_SIGMA = 0.5


def gaussian_weight(x: jnp.ndarray) -> jnp.ndarray:
    """1-D truncated gaussian filter weight at offset ``x`` (pixels)."""
    alpha = -1.0 / (2.0 * _SIGMA * _SIGMA)
    w = jnp.exp(alpha * x * x) - jnp.exp(alpha * FILTER_RADIUS * FILTER_RADIUS)
    return jnp.maximum(w, 0.0)


def splat(pos, values, height: int, width: int, border: int = BORDER, active=None):
    """Scatter samples into a padded image with 4×4 gaussian filter taps.

    Args:
      pos: (N, 2) continuous film positions in *unpadded pixel* coordinates
        (pixel (i, j) has center (i+0.5, j+0.5)); may be attached — the
        filter weights then carry position gradients.
      values: (N, C) per-sample channel values.
      height, width: unpadded film size.
      border: padding on each side (sample_border).
      active: optional (N,) mask.

    Returns:
      (height + 2·border, width + 2·border, C) accumulated image.
    """
    n = pos.shape[0]
    c = values.shape[-1]
    ph, pw = height + 2 * border, width + 2 * border

    # 4 taps per axis around the sample (pixel centers at integer + 0.5)
    base = jnp.floor(jax.lax.stop_gradient(pos) - 0.5).astype(jnp.int32) - 1  # (N, 2)
    offs = jnp.arange(4, dtype=jnp.int32)
    tx = base[:, 0:1] + offs  # (N, 4) unpadded pixel indices (x)
    ty = base[:, 1:2] + offs
    wx = gaussian_weight(pos[:, 0:1] - (tx.astype(pos.dtype) + 0.5))  # (N, 4)
    wy = gaussian_weight(pos[:, 1:2] - (ty.astype(pos.dtype) + 0.5))

    w = wy[:, :, None] * wx[:, None, :]  # (N, 4y, 4x)
    ix = tx[:, None, :] + border  # (N, 1, 4)
    iy = ty[:, :, None] + border  # (N, 4, 1)
    inb = (ix >= 0) & (ix < pw) & (iy >= 0) & (iy < ph)
    if active is not None:
        inb = inb & active[:, None, None]
    w = jnp.where(inb, w, 0.0)

    flat_idx = jnp.clip(iy * pw + ix, 0, ph * pw - 1).reshape(n, 16)
    contrib = w.reshape(n, 16, 1) * values[:, None, :]  # (N, 16, C)

    img = jnp.zeros((ph * pw, c), values.dtype)
    img = img.at[flat_idx.reshape(-1)].add(contrib.reshape(-1, c))
    return img.reshape(ph, pw, c)


def splat_pixel_major(pix, pos, values, height: int, width: int,
                      spp: int, border: int = BORDER, active=None):
    """Scatter-free splat for pixel-major contiguous wavefronts.

    TPU-native re-design of the film accumulation: XLA's TPU scatter-add is
    row-serial on the scalar core, so :func:`splat`'s 16 tap rows per sample
    cost ~16·N gather-rate rows per program — measured on par with the whole
    sphere trace.  When the caller's lane axis is *pixel-major and
    spp-aligned* (``lane = off + arange(M)``, ``off % spp == 0``,
    ``M % spp == 0`` — true for every wavefront this renderer builds, which
    assigns ``pix = lane // spp``), the splat is instead:

      1. per-sample 6×6 tap weights on a window anchored at the sample's
         OWN pixel (the gaussian's 2-pixel support means a jittered sample
         only ever touches [-2, +2] around its pixel; 6 covers a one-pixel
         group straddle),
      2. a dense ``(groups, spp, 36, C) → (groups, 36, C)`` reduction
         (consecutive groups = consecutive padded-film pixels),
      3. 36 contiguous ``dynamic_update_slice`` adds into the flat padded
         film — one per (dy, dx) tap offset, each a plain dense vector add.

    No scatter anywhere; the VJP is dense slices + broadcasts (and the
    attached position gradients flow through the weights exactly as in
    :func:`splat`).  Values match :func:`splat` to fp add-order.

    Args:
      pix: (M,) int — *padded-film* flat pixel index of each lane,
        non-decreasing, ``spp`` consecutive lanes per pixel, consecutive
        groups on consecutive pixels.
      pos: (M, 2) continuous film positions in unpadded pixel coords (may
        be attached); each sample's position lies inside its own pixel.
      values: (M, C); spp/active/border as in :func:`splat`.
    """
    m = pos.shape[0]
    c = values.shape[-1]
    assert m % spp == 0, (m, spp)
    g = m // spp
    ph, pw = height + 2 * border, width + 2 * border

    # Window anchor = the GROUP's pixel (p0 + group index), not the lane's
    # own: group g's window is overlap-added at flat pixel p0 + g below, so
    # every lane in it must weight taps relative to that common anchor.
    # (For spp-aligned wavefronts anchor == own pixel; for a one-pixel
    # group straddle the 6-tap window still covers the +1 lane's support.)
    p0 = pix[0].astype(jnp.int32)
    pa = p0 + jnp.arange(m, dtype=jnp.int32) // spp
    px = (pa % pw) - border
    py = (pa // pw) - border

    offs = jnp.arange(-2, 4, dtype=jnp.int32)  # window taps, 6 per axis
    tx = px[:, None] + offs  # (M, 6) unpadded tap x
    ty = py[:, None] + offs
    wx = gaussian_weight(pos[:, 0:1] - (tx.astype(pos.dtype) + 0.5))
    wy = gaussian_weight(pos[:, 1:2] - (ty.astype(pos.dtype) + 0.5))
    # x taps outside the padded film would wrap to an adjacent row in flat
    # index space — zero them (y overflows land in the flat margin and are
    # cropped).  The old per-tap path's `inb` mask, expressed per axis.
    wx = jnp.where((tx + border >= 0) & (tx + border < pw), wx, 0.0)
    wy = jnp.where((ty + border >= 0) & (ty + border < ph), wy, 0.0)
    w = (wy[:, :, None] * wx[:, None, :]).reshape(m, 36)
    if active is not None:
        w = jnp.where(active[:, None], w, 0.0)

    # (M, 36, C) → per-pixel windows (G, 36, C); XLA fuses the product into
    # the spp reduction, so the big intermediate never materializes.
    win = (w[..., None] * values[:, None, :]).reshape(g, spp, 36, c).sum(axis=1)

    # overlap-add: 36 contiguous slice-adds into the flat padded film.
    # Margin absorbs windows of border pixels (negative / past-end starts).
    margin = 2 * pw + 3
    flat = jnp.zeros((ph * pw + 2 * margin, c), values.dtype)
    for k in range(36):
        dy, dx = k // 6 - 2, k % 6 - 2
        start = p0 + dy * pw + dx + margin
        cur = jax.lax.dynamic_slice(flat, (start, 0), (g, c))
        flat = jax.lax.dynamic_update_slice(flat, cur + win[:, k, :], (start, 0))
    return flat[margin:margin + ph * pw].reshape(ph, pw, c)


def develop(block: jnp.ndarray, border: int = BORDER, eps: float = 1e-8):
    """Crop the border and normalize by the (last) weight channel (hdrfilm
    develop, reparam.py:183-185). Returns (H, W, C-1)."""
    if border > 0:
        block = block[border:-border, border:-border]
    w = block[..., -1]
    safe = jnp.where(jnp.abs(w) > eps, w, 1.0)
    return block[..., :-1] / safe[..., None]
