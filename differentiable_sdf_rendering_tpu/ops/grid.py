"""Dense-grid cubic B-spline interpolation: value, gradient, Hessian.

TPU-native replacement for the reference's Dr.Jit ``mi.Texture3f``
``eval_cubic / eval_cubic_grad / eval_cubic_hessian`` (used by
``/root/reference/python/shapes.py:420-467``).  One fused evaluation gathers
the 4x4x4 tap stencil once and produces the full derivative jet
(value, 3 first derivatives, 6 second derivatives) via three separable
tensor contractions — the contraction pattern maps onto the VPU/MXU instead
of 64 scalar loads, and the backward pass w.r.t. the grid is the natural
XLA scatter-add of the gather (no hand-written VJP needed).

Conventions (matching the reference / Mitsuba):
  * grid ``data`` has shape (Z, Y, X); a point ``p = (x, y, z)`` in the unit
    cube indexes ``data[z, y, x]``.
  * continuous voxel coordinate ``c = p * res - 0.5``; taps at
    ``floor(c) + {-1, 0, 1, 2}``, clamped to the grid (Mitsuba "clamp" wrap).
  * gradients/Hessians are w.r.t. the *normalized* point coordinates, i.e.
    include the ``res`` / ``res**2`` chain factors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Interpolation contractions must run at full fp32: the default TPU matmul
# precision (bf16 passes on the MXU) costs ~1e-3 relative error, which is
# fatal for SDF Hessians and finite-difference gradient checks.
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "bspline_weights",
    "grid_eval",
    "grid_eval_grad",
    "grid_eval_all",
    "grid_eval_trilinear",
    "pad_amount",
    "pad_grid",
]


def pad_amount(res: int) -> int:
    """Edge padding for the contiguous-fetch path.  A constant 4 suffices
    for ARBITRARY query positions: the 4-wide window start is clipped into
    the padded table, and with edge replication ``padded[j] ==
    data[clip(j - 4)]`` holds for every j, so clipped window taps coincide
    exactly with per-tap clamping (verified bit-exact for queries many
    cubes outside the grid)."""
    del res
    return 4


def pad_grid(data: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicate pad so that ``padded[j] == data[clip(j - pf, 0, n-1)]``
    — the padded array *is* the clamped lookup table, enabling contiguous
    4-wide x-fetches instead of 64 scalar gathers (see ``_tap_setup``)."""
    pz = pad_amount(data.shape[-3])
    py = pad_amount(data.shape[-2])
    px = pad_amount(data.shape[-1])
    return jnp.pad(data, ((pz, pz), (py, py), (px, px)), mode="edge")


def bspline_weights(f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform cubic B-spline basis and its first two derivatives.

    Args:
      f: fractional coordinate, any shape ``(...)``.

    Returns:
      ``(w, dw, ddw)`` each of shape ``(..., 4)`` for taps at offsets
      ``{-1, 0, 1, 2}`` from the base voxel.  Derivatives are w.r.t. ``f``
      (continuous voxel units; multiply by ``res`` per derivative order to
      get normalized-coordinate derivatives).
    """
    f2 = f * f
    f3 = f2 * f
    one_m = 1.0 - f
    w = jnp.stack(
        [
            one_m * one_m * one_m * (1.0 / 6.0),
            (3.0 * f3 - 6.0 * f2 + 4.0) * (1.0 / 6.0),
            (-3.0 * f3 + 3.0 * f2 + 3.0 * f + 1.0) * (1.0 / 6.0),
            f3 * (1.0 / 6.0),
        ],
        axis=-1,
    )
    dw = jnp.stack(
        [
            -0.5 * one_m * one_m,
            (3.0 * f2 - 4.0 * f) * 0.5,
            (-3.0 * f2 + 2.0 * f + 1.0) * 0.5,
            0.5 * f2,
        ],
        axis=-1,
    )
    ddw = jnp.stack([one_m, 3.0 * f - 2.0, 1.0 - 3.0 * f, f], axis=-1)
    return w, dw, ddw


def _tap_setup(data: jnp.ndarray, p: jnp.ndarray, padded: jnp.ndarray | None = None):
    """Compute tap values (..., 4z, 4y, 4x) and per-axis fractions.

    With ``padded`` (from :func:`pad_grid`) the x-taps are fetched as one
    contiguous 4-wide ``lax.gather`` row per (z, y) pair — 16 gather rows
    instead of 64 scalar gathers, exactly equivalent to the clamped path.
    """
    zres, yres, xres = data.shape[-3], data.shape[-2], data.shape[-1]
    res = jnp.asarray([xres, yres, zres], dtype=p.dtype)
    c = p * res - 0.5
    base = jnp.floor(c)
    f = c - base
    base = base.astype(jnp.int32)

    if padded is None:
        offs = jnp.arange(-1, 3, dtype=jnp.int32)
        ix = jnp.clip(base[..., 0:1] + offs, 0, xres - 1)  # (..., 4)
        iy = jnp.clip(base[..., 1:2] + offs, 0, yres - 1)
        iz = jnp.clip(base[..., 2:3] + offs, 0, zres - 1)
        lin = (
            iz[..., :, None, None] * (yres * xres)
            + iy[..., None, :, None] * xres
            + ix[..., None, None, :]
        )  # (..., 4, 4, 4)
        taps = jnp.take(data.reshape(-1), lin, axis=0)
        return taps, f, res

    pz, py, px = pad_amount(zres), pad_amount(yres), pad_amount(xres)
    offs = jnp.arange(-1, 3, dtype=jnp.int32)
    # clip into the padded table; all four taps stay in-range by construction
    iz = jnp.clip(base[..., 2:3] + offs + pz, 0, padded.shape[-3] - 1)  # (..., 4)
    iy = jnp.clip(base[..., 1:2] + offs + py, 0, padded.shape[-2] - 1)
    x0 = jnp.clip(base[..., 0] - 1 + px, 0, padded.shape[-1] - 4)       # (...,)

    batch = p.shape[:-1]
    flatn = 1
    for s in batch:
        flatn *= s
    izf = iz.reshape(flatn, 4)
    iyf = iy.reshape(flatn, 4)
    x0f = x0.reshape(flatn)
    starts = jnp.concatenate(
        [
            jnp.broadcast_to(izf[:, :, None, None], (flatn, 4, 4, 1)),
            jnp.broadcast_to(iyf[:, None, :, None], (flatn, 4, 4, 1)),
            jnp.broadcast_to(x0f[:, None, None, None], (flatn, 4, 4, 1)),
        ],
        axis=-1,
    ).reshape(flatn * 16, 3)
    rows = jax.lax.gather(
        padded,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, 1, 4),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (flatn*16, 4)
    taps = rows.reshape(batch + (4, 4, 4))
    return taps, f, res


def grid_eval(data: jnp.ndarray, p: jnp.ndarray, padded: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cubic B-spline value at points ``p`` (..., 3) → (...,)."""
    taps, f, _ = _tap_setup(data, p, padded)
    wx, _, _ = bspline_weights(f[..., 0])
    wy, _, _ = bspline_weights(f[..., 1])
    wz, _, _ = bspline_weights(f[..., 2])
    t = jnp.einsum("...zyx,...x->...zy", taps, wx, precision=_HI)
    t = jnp.einsum("...zy,...y->...z", t, wy, precision=_HI)
    return jnp.einsum("...z,...z->...", t, wz, precision=_HI)


def grid_eval_grad(data: jnp.ndarray, p: jnp.ndarray, padded: jnp.ndarray | None = None):
    """Value and spatial gradient → ``(value (...,), grad (..., 3))``."""
    taps, f, res = _tap_setup(data, p, padded)
    wx, dwx, _ = bspline_weights(f[..., 0])
    wy, dwy, _ = bspline_weights(f[..., 1])
    wz, dwz, _ = bspline_weights(f[..., 2])

    Wx = jnp.stack([wx, dwx], axis=-1)  # (..., 4, 2)
    Wy = jnp.stack([wy, dwy], axis=-1)
    Wz = jnp.stack([wz, dwz], axis=-1)
    t = jnp.einsum("...zyx,...xi->...zyi", taps, Wx, precision=_HI)
    t = jnp.einsum("...zyi,...yj->...zij", t, Wy, precision=_HI)
    out = jnp.einsum("...zij,...zk->...kji", t, Wz, precision=_HI)  # (..., 2z, 2y, 2x)

    value = out[..., 0, 0, 0]
    grad = jnp.stack(
        [
            out[..., 0, 0, 1] * res[0],
            out[..., 0, 1, 0] * res[1],
            out[..., 1, 0, 0] * res[2],
        ],
        axis=-1,
    )
    return value, grad


def grid_eval_all(data: jnp.ndarray, p: jnp.ndarray, padded: jnp.ndarray | None = None):
    """Full derivative jet: ``(value (...,), grad (..., 3), hess (..., 3, 3))``.

    Equivalent of the reference's ``texture.eval_cubic_hessian``
    (``/root/reference/python/shapes.py:438-450``) in one fused pass.
    """
    taps, f, res = _tap_setup(data, p, padded)
    wx, dwx, ddwx = bspline_weights(f[..., 0])
    wy, dwy, ddwy = bspline_weights(f[..., 1])
    wz, dwz, ddwz = bspline_weights(f[..., 2])

    Wx = jnp.stack([wx, dwx, ddwx], axis=-1)  # (..., 4, 3)
    Wy = jnp.stack([wy, dwy, ddwy], axis=-1)
    Wz = jnp.stack([wz, dwz, ddwz], axis=-1)
    t = jnp.einsum("...zyx,...xi->...zyi", taps, Wx, precision=_HI)
    t = jnp.einsum("...zyi,...yj->...zij", t, Wy, precision=_HI)
    out = jnp.einsum("...zij,...zk->...kji", t, Wz, precision=_HI)  # (..., 3z, 3y, 3x)

    rx, ry, rz = res[0], res[1], res[2]
    value = out[..., 0, 0, 0]
    grad = jnp.stack(
        [out[..., 0, 0, 1] * rx, out[..., 0, 1, 0] * ry, out[..., 1, 0, 0] * rz],
        axis=-1,
    )
    hxx = out[..., 0, 0, 2] * (rx * rx)
    hyy = out[..., 0, 2, 0] * (ry * ry)
    hzz = out[..., 2, 0, 0] * (rz * rz)
    hxy = out[..., 0, 1, 1] * (rx * ry)
    hxz = out[..., 1, 0, 1] * (rx * rz)
    hyz = out[..., 1, 1, 0] * (ry * rz)
    row_x = jnp.stack([hxx, hxy, hxz], axis=-1)
    row_y = jnp.stack([hxy, hyy, hyz], axis=-1)
    row_z = jnp.stack([hxz, hyz, hzz], axis=-1)
    hess = jnp.stack([row_x, row_y, row_z], axis=-2)
    return value, grad, hess


def grid_eval_trilinear(data: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear value (cheap path for redistancing / previews)."""
    zres, yres, xres = data.shape[-3], data.shape[-2], data.shape[-1]
    res = jnp.asarray([xres, yres, zres], dtype=p.dtype)
    c = p * res - 0.5
    base = jnp.floor(c)
    f = c - base
    base = base.astype(jnp.int32)
    offs = jnp.arange(0, 2, dtype=jnp.int32)
    ix = jnp.clip(base[..., 0:1] + offs, 0, xres - 1)
    iy = jnp.clip(base[..., 1:2] + offs, 0, yres - 1)
    iz = jnp.clip(base[..., 2:3] + offs, 0, zres - 1)
    lin = (
        iz[..., :, None, None] * (yres * xres)
        + iy[..., None, :, None] * xres
        + ix[..., None, None, :]
    )
    taps = jnp.take(data.reshape(-1), lin, axis=0)  # (..., 2, 2, 2)
    wx = jnp.stack([1.0 - f[..., 0], f[..., 0]], axis=-1)
    wy = jnp.stack([1.0 - f[..., 1], f[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - f[..., 2], f[..., 2]], axis=-1)
    t = jnp.einsum("...zyx,...x->...zy", taps, wx, precision=_HI)
    t = jnp.einsum("...zy,...y->...z", t, wy, precision=_HI)
    return jnp.einsum("...z,...z->...", t, wz, precision=_HI)
