"""Perspective cameras and the reference's regular multi-view rigs.

Counterpart of Mitsuba's perspective sensor as configured by the reference
(fov 39°, look-at (0.5,0.5,0.5), radius-2 ring with sin-wobbled elevation,
gaussian pixel filter, sample_border — ``/root/reference/python/util.py:
84-143``).  Cameras are pytree structs; a rig is one struct with a leading
view axis on every leaf, ready for ``vmap``/``shard_map`` over views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.vecmath import normalize

__all__ = [
    "PerspectiveCamera",
    "SphericalCamera",
    "look_at",
    "regular_cameras",
    "regular_cameras_top",
    "turntable_cameras",
]


@struct.dataclass
class PerspectiveCamera:
    """Pinhole camera. ``rot`` columns are (right, up, forward) in world space."""

    origin: jnp.ndarray        # (..., 3)
    rot: jnp.ndarray           # (..., 3, 3)
    tan_half_fov: jnp.ndarray  # (...,) — x-axis field of view
    resx: int = struct.field(pytree_node=False, default=128)
    resy: int = struct.field(pytree_node=False, default=128)

    @property
    def n_views(self):
        return self.origin.shape[0] if self.origin.ndim > 1 else 1

    def view(self, i):
        return self.replace(
            origin=self.origin[i], rot=self.rot[i], tan_half_fov=self.tan_half_fov[i]
        )

    def sample_ray(self, pos_pixels: jnp.ndarray):
        """Film position (N, 2) in pixel coords → (origin (N,3), dir (N,3)).

        Pixel (0,0) is top-left; position units are unpadded pixels (may lie
        outside [0, res) when sample_border is active).
        """
        u = pos_pixels[..., 0] / self.resx
        v = pos_pixels[..., 1] / self.resy
        aspect = self.resy / self.resx
        x = (2.0 * u - 1.0) * self.tan_half_fov
        y = (1.0 - 2.0 * v) * self.tan_half_fov * aspect
        d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        # rot @ d as broadcast-multiply-reduce: per-lane small einsums lower
        # to padded batched dot_generals far below the VPU (ops/grid.py
        # _jet_contract note)
        d = normalize(jnp.sum(self.rot * d_cam[..., None, :], axis=-1))
        o = jnp.broadcast_to(self.origin, d.shape)
        return o, d

    def project(self, p: jnp.ndarray):
        """World point → (film position (N, 2) in pixels, importance (N,)).

        The importance is the perspective sensor importance ∝ 1/cos³θ (up to
        a constant, which cancels in the reference's attached reweighting
        ``w/detach(w)``, reparam.py:99-104).
        """
        rel = p - self.origin
        # rotᵀ @ rel, elementwise (see sample_ray)
        p_cam = jnp.sum(self.rot * rel[..., :, None], axis=-2)
        z = jnp.maximum(p_cam[..., 2], 1e-8)
        x = p_cam[..., 0] / z
        y = p_cam[..., 1] / z
        aspect = self.resy / self.resx
        u = (x / self.tan_half_fov + 1.0) * 0.5
        v = (1.0 - y / (self.tan_half_fov * aspect)) * 0.5
        pos = jnp.stack([u * self.resx, v * self.resy], axis=-1)
        cos_theta = z / jnp.sqrt(jnp.maximum(jnp.sum(p_cam * p_cam, -1), 1e-20))
        importance = cos_theta ** (-3)
        return pos, importance


@struct.dataclass
class SphericalCamera:
    """Equirectangular (or uniform-sphere) sensor — port of the custom
    Mitsuba sensor plugin at ``/root/reference/figures/spherical_sensor.py``
    (proves the custom-sensor extension point)."""

    origin: jnp.ndarray  # (3,)
    resx: int = struct.field(pytree_node=False, default=256)
    resy: int = struct.field(pytree_node=False, default=128)
    uniform: bool = struct.field(pytree_node=False, default=False)

    def view(self, i):
        return self

    def sample_ray(self, pos_pixels: jnp.ndarray):
        u = pos_pixels[..., 0] / self.resx
        v = pos_pixels[..., 1] / self.resy
        if self.uniform:
            ct = 1.0 - 2.0 * v
            st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        else:
            theta = v * jnp.pi
            ct, st = jnp.cos(theta), jnp.sin(theta)
        phi = u * 2.0 * jnp.pi
        d = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], axis=-1)
        o = jnp.broadcast_to(self.origin, d.shape)
        return o, d

    def project(self, p: jnp.ndarray):
        d = normalize(p - self.origin)
        theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
        phi = jnp.arctan2(d[..., 2], d[..., 0]) % (2.0 * jnp.pi)
        u = phi / (2.0 * jnp.pi)
        v = theta / jnp.pi
        pos = jnp.stack([u * self.resx, v * self.resy], axis=-1)
        return pos, jnp.ones(p.shape[:-1], p.dtype)


def look_at(origin, target, up=(0.0, 1.0, 0.0)):
    """Rotation with columns (right, up, forward), world y-up convention."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(target - origin)
    s = normalize(jnp.cross(up, f))
    u = jnp.cross(f, s)
    return jnp.stack([s, u, f], axis=-1)


def _camera_from_origins(origins, resx, resy, fov_deg=39.0, target=(0.5, 0.5, 0.5)):
    rots = jnp.stack([look_at(o, target) for o in origins])
    th = jnp.full((len(origins),), jnp.tan(jnp.deg2rad(fov_deg) / 2.0), jnp.float32)
    return PerspectiveCamera(
        origin=jnp.stack([jnp.asarray(o, jnp.float32) for o in origins]),
        rot=rots,
        tan_half_fov=th,
        resx=resx,
        resy=resy,
    )


def regular_cameras(
    n_sensors: int,
    angle_shift: float = 0.0,
    resx: int = 128,
    resy: int = 128,
    radius: float = 2.0,
    height_scale: float = 1.0,
) -> PerspectiveCamera:
    """The reference's regularly spaced optimization rig (util.py:115-138):
    ring of radius 2 around (0.5, 0.5, 0.5), elevation 1.15/height_scale +
    0.5·sin(angle·n/4) clamped to the upper hemisphere, fov 39°."""
    angles = (jnp.arange(n_sensors) / n_sensors + angle_shift / n_sensors) * 2.0 * jnp.pi
    if n_sensors > 1:
        elevation = 1.15 / height_scale + jnp.sin(angles * n_sensors / 4.0) * 0.5
        elevation = jnp.clip(elevation, 0.0, jnp.pi / 2.0 + 0.05)
    else:
        elevation = jnp.full((1,), 1.15 / height_scale)
    origins = jnp.stack(
        [
            jnp.cos(angles) * jnp.sin(elevation) * radius + 0.5,
            jnp.cos(elevation) * radius,
            jnp.sin(angles) * jnp.sin(elevation) * radius + 0.5,
        ],
        axis=-1,
    )
    return _camera_from_origins(list(origins), resx, resy)


def regular_cameras_top(n_sensors, angle_shift=0.0, resx=128, resy=128, radius=2.0):
    """Top-view variant (util.py:141-143)."""
    return regular_cameras(n_sensors, angle_shift, resx, resy, radius, height_scale=1.3)


def turntable_cameras(n_frames: int, resx=128, resy=128, radius=1.5, height=0.8):
    """Turntable rig for videos (util.py:25-42)."""
    angles = jnp.arange(n_frames) / n_frames * 2.0 * jnp.pi
    origins = jnp.stack(
        [jnp.cos(angles) * radius + 0.5, jnp.full((n_frames,), height), jnp.sin(angles) * radius + 0.5],
        axis=-1,
    )
    return _camera_from_origins(list(origins), resx, resy)
