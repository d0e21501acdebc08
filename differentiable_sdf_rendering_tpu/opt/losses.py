"""Image losses (reference ``python/losses.py``).

Note: the reference's ``downsample`` gathers the 2×2 neighborhood *without
striding* and returns an image of the same resolution — it is a box blur,
not a decimation (losses.py:14-31).  ``multiscale`` therefore sums the loss
over progressively blurred (same-size) images; we reproduce that exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1", "l2", "mape", "box_blur_2x2", "multiscale", "multiscale_l1", "downsample_half"]


def l1(img, ref):
    return jnp.mean(jnp.abs(img - ref))


def l2(img, ref):
    return jnp.mean((img - ref) ** 2)


def mape(img, ref):
    rel = jnp.abs(img - ref) / jnp.abs(1e-2 + jnp.mean(ref, axis=-1, keepdims=True))
    return jnp.mean(rel)


def box_blur_2x2(img):
    """Same-resolution 2×2 box filter with clamped edges (losses.py:14-31)."""
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return 0.25 * (img + right + down + down_right)


def multiscale(img, ref, loss_fn=l1, levels: int = 4):
    loss = loss_fn(img, ref)
    for _ in range(levels - 1):
        img = box_blur_2x2(img)
        ref = box_blur_2x2(ref)
        loss = loss + loss_fn(img, ref)
    return loss / levels


def multiscale_l1(img, ref, levels: int = 4):
    return multiscale(img, ref, l1, levels)


def downsample_half(img):
    """True 2× decimation (average pooling) — used to build reference-image
    pyramids for the multiscale *rendering* schedule (shape_opt.py:16-29)."""
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def ema_smooth(values, beta: float = 0.9):
    """Exponential-moving-average smoothing for loss curves (the reference's
    figure styling helper, figures/common.py:148-156)."""
    import numpy as _np

    out = _np.asarray(values, dtype=_np.float64).copy()
    for i in range(1, len(out)):
        out[i] = beta * out[i - 1] + (1.0 - beta) * out[i]
    return out
