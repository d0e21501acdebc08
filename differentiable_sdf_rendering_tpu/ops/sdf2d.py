"""2-D SDFs and the 2-D weighted sphere trace — the low-dimensional
executable spec of the tracer math.

Ports of ``/root/reference/python/sdf2d/shapes.py`` (Grid2d, DiskSDF,
RectangleSDF, smooth-min UnionSDF, HalfSpaceSDF) and the pedagogical 2-D
weighted trace ``figures/disk_tracing.py:29-81``.  These are used by the
figure pipelines and by unit tests to validate the 3-D tracer's trapezoid
accumulation in a setting with closed-form geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from . import grid as gridops

__all__ = [
    "Grid2d",
    "DiskSDF",
    "RectangleSDF",
    "UnionSDF",
    "HalfSpaceSDF",
    "disk_sdf",
    "arc_sdf",
    "trace_2d",
]


def _bspline_eval_2d(data, p):
    """Bicubic B-spline value/grad/hessian on a 2-D grid (sdf2d/shapes.py:32-55)."""
    yres, xres = data.shape
    res = jnp.asarray([xres, yres], p.dtype)
    c = p * res - 0.5
    base = jnp.floor(c)
    f = c - base
    base = base.astype(jnp.int32)
    offs = jnp.arange(-1, 3)
    ix = jnp.clip(base[..., 0:1] + offs, 0, xres - 1)
    iy = jnp.clip(base[..., 1:2] + offs, 0, yres - 1)
    lin = iy[..., :, None] * xres + ix[..., None, :]
    taps = jnp.take(data.reshape(-1), lin, axis=0)  # (..., 4y, 4x)
    wx, dwx, ddwx = gridops.bspline_weights(f[..., 0])
    wy, dwy, ddwy = gridops.bspline_weights(f[..., 1])
    Wx = jnp.stack([wx, dwx, ddwx], -1)
    Wy = jnp.stack([wy, dwy, ddwy], -1)
    t = jnp.einsum("...yx,...xi->...yi", taps, Wx)
    out = jnp.einsum("...yi,...yj->...ji", t, Wy)  # (..., 3y, 3x)
    v = out[..., 0, 0]
    g = jnp.stack([out[..., 0, 1] * xres, out[..., 1, 0] * yres], -1)
    h = jnp.stack(
        [
            jnp.stack([out[..., 0, 2] * xres * xres, out[..., 1, 1] * xres * yres], -1),
            jnp.stack([out[..., 1, 1] * xres * yres, out[..., 2, 0] * yres * yres], -1),
        ],
        -2,
    )
    return v, g, h


@struct.dataclass
class Grid2d:
    """Dense 2-D SDF grid with bicubic interpolation (sdf2d/shapes.py:22-76)."""

    data: jnp.ndarray  # (Y, X)

    def eval(self, p):
        return _bspline_eval_2d(self.data, p)[0]

    def eval_and_grad(self, p):
        v, g, _ = _bspline_eval_2d(self.data, p)
        return v, g

    def eval_all(self, p):
        return _bspline_eval_2d(self.data, p)


@struct.dataclass
class DiskSDF:
    p: jnp.ndarray
    r: jnp.ndarray

    @classmethod
    def create(cls, p=(0.5, 0.5), r=0.3):
        return cls(p=jnp.asarray(p, jnp.float32), r=jnp.asarray(r, jnp.float32))

    def eval(self, x):
        return jnp.linalg.norm(x - self.p, axis=-1) - self.r

    def eval_and_grad(self, x):
        d = x - self.p
        n = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-20)
        return n - self.r, d / n[..., None]

    def eval_all(self, x):
        v, g = self.eval_and_grad(x)
        n = jnp.maximum(jnp.linalg.norm(x - self.p, axis=-1), 1e-20)
        eye = jnp.eye(2, dtype=x.dtype)
        h = (eye - g[..., :, None] * g[..., None, :]) / n[..., None, None]
        return v, g, h


@struct.dataclass
class RectangleSDF:
    p: jnp.ndarray
    b: jnp.ndarray  # half extents

    @classmethod
    def create(cls, p=(0.5, 0.5), b=(0.2, 0.1)):
        return cls(p=jnp.asarray(p, jnp.float32), b=jnp.asarray(b, jnp.float32))

    def eval(self, x):
        q = jnp.abs(x - self.p) - self.b
        return jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
            jnp.max(q, axis=-1), 0.0
        )

    def eval_and_grad(self, x):
        g = jax.vmap(jax.grad(lambda q: self.eval(q)))(x.reshape(-1, 2)).reshape(x.shape)
        return self.eval(x), g

    def eval_all(self, x):
        v, g = self.eval_and_grad(x)
        h = jax.vmap(jax.hessian(lambda q: self.eval(q)))(x.reshape(-1, 2)).reshape(
            x.shape[:-1] + (2, 2)
        )
        return v, g, h


@struct.dataclass
class HalfSpaceSDF:
    n: jnp.ndarray
    offset: jnp.ndarray

    @classmethod
    def create(cls, n=(0.0, 1.0), offset=0.5):
        n = jnp.asarray(n, jnp.float32)
        return cls(n=n / jnp.linalg.norm(n), offset=jnp.asarray(offset, jnp.float32))

    def eval(self, x):
        return jnp.sum(x * self.n, -1) - self.offset

    def eval_and_grad(self, x):
        return self.eval(x), jnp.broadcast_to(self.n, x.shape)

    def eval_all(self, x):
        v, g = self.eval_and_grad(x)
        return v, g, jnp.zeros(x.shape[:-1] + (2, 2), x.dtype)


@struct.dataclass
class UnionSDF:
    """Smooth-min union of two SDFs (sdf2d/shapes.py:115-190)."""

    a: DiskSDF
    b: DiskSDF
    k: float = struct.field(pytree_node=False, default=0.05)

    def eval(self, x):
        d1, d2 = self.a.eval(x), self.b.eval(x)
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / self.k, 0.0, 1.0)
        return d2 * (1 - h) + d1 * h - self.k * h * (1 - h)

    def eval_and_grad(self, x):
        g = jax.vmap(jax.grad(lambda q: self.eval(q)))(x.reshape(-1, 2)).reshape(x.shape)
        return self.eval(x), g

    def eval_all(self, x):
        v, g = self.eval_and_grad(x)
        h = jax.vmap(jax.hessian(lambda q: self.eval(q)))(x.reshape(-1, 2)).reshape(
            x.shape[:-1] + (2, 2)
        )
        return v, g, h


def disk_sdf(pts, center=(0.5, 0.5), r=0.3):
    """numpy-style helper (sdf2d/shapes.py:221-226)."""
    return jnp.linalg.norm(pts - jnp.asarray(center), axis=-1) - r


def arc_sdf(pts, center=(0.5, 0.5), r=0.3, aperture=1.0, thickness=0.02):
    """Arc SDF (sdf2d/shapes.py:228-234)."""
    p = pts - jnp.asarray(center)
    sc = jnp.asarray([jnp.sin(aperture), jnp.cos(aperture)])
    px = jnp.abs(p[..., 0])
    p = jnp.stack([px, p[..., 1]], -1)
    in_sector = sc[1] * px > sc[0] * p[..., 1]
    d_end = jnp.linalg.norm(p - sc * r, axis=-1)
    d_ring = jnp.abs(jnp.linalg.norm(p, axis=-1) - r)
    return jnp.where(in_sector, d_end, d_ring) - thickness


def trace_2d(sdf, o, d, n_steps: int = 64, trace_eps: float = 1e-5, extra_thresh: float = 0.05):
    """Readable 2-D weighted sphere trace — the executable spec of the 3-D
    accumulators (``figures/disk_tracing.py:29-81``): trapezoid warp_t and
    weight sums with the approach ("extra") weighting, no derivatives.

    Returns dict(its_t, warp_t, weight_sum, i).
    """
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)

    def body(k, s):
        act = s["active"]
        x = o + s["t"][..., None] * d
        f, g, _ = sdf.eval_all(x)
        intersected = f < trace_eps
        its_t = jnp.where(act & intersected, s["t"], s["its_t"])
        surf = jnp.abs(f)
        n_dot_d = jnp.sum(g * d, -1)
        n_dot_n = jnp.maximum(jnp.sum(g * g, -1), 1e-20)
        denom = 1e-6 + surf + 0.05 * n_dot_d * n_dot_d / n_dot_n
        w = denom ** -3.0
        inv_den = 1.0 / jnp.maximum(jnp.minimum(extra_thresh, surf), 1e-12)
        diff = s["prev_surf"] - surf
        ew = jnp.minimum(s["extra"] + jnp.where(diff >= 0, diff * inv_den, 0.0), 1.0)
        seg = jnp.where(intersected, 0.0, surf)
        seg_len = 0.5 * (seg + s["prev_surf"])
        inc = seg_len * w * ew
        ws = s["ws"] + jnp.where(act, inc, 0.0)
        wt = s["wt"] + jnp.where(act, inc * s["t"], 0.0)
        t = jnp.where(act, s["t"] + seg, s["t"])
        act = act & ~intersected & (t < 4.0)
        return {
            "t": t, "its_t": its_t, "prev_surf": jnp.where(act, surf, s["prev_surf"]),
            "ws": ws, "wt": wt, "extra": jnp.where(act, ew, s["extra"]),
            "active": act, "i": s["i"] + act.astype(jnp.int32),
        }

    n = o.shape[:-1]
    state = {
        "t": jnp.zeros(n), "its_t": jnp.full(n, jnp.inf), "prev_surf": jnp.zeros(n),
        "ws": jnp.zeros(n), "wt": jnp.zeros(n), "extra": jnp.zeros(n),
        "active": jnp.ones(n, bool), "i": jnp.zeros(n, jnp.int32),
    }
    s = jax.lax.fori_loop(0, n_steps, body, state)
    warp_t = jnp.where(s["ws"] > 1e-7, s["wt"] / jnp.maximum(s["ws"], 1e-20), jnp.inf)
    return {"its_t": s["its_t"], "warp_t": warp_t, "weight_sum": s["ws"], "i": s["i"]}
