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

__all__ = ["FILTER_RADIUS", "BORDER", "gaussian_weight", "splat", "develop"]

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


def develop(block: jnp.ndarray, border: int = BORDER, eps: float = 1e-8):
    """Crop the border and normalize by the (last) weight channel (hdrfilm
    develop, reparam.py:183-185). Returns (H, W, C-1)."""
    if border > 0:
        block = block[border:-border, border:-border]
    w = block[..., -1]
    safe = jnp.where(jnp.abs(w) > eps, w, 1.0)
    return block[..., :-1] / safe[..., None]
