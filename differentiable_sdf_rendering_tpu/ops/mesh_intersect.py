"""Batched triangle-mesh ray intersection for hybrid SDF+mesh scenes.

TPU-native counterpart of the reference's OptiX-backed hybrid intersect
(``/root/reference/python/integrators/reparam.py:201-232``): the reference
merges SDF hits with hardware-BVH mesh hits by nearest t.  A BVH is the
wrong tool on TPU (irregular pointer chasing defeats the VPU/MXU); the
mixed scenes the reference actually uses carry *small* auxiliary meshes
(floor planes, studio backdrops — ``figures/result_utils.py:48-76``), so we
intersect the full triangle soup as one dense batched Möller–Trumbore
computation: rays broadcast against triangle chunks, minimum over
triangles.  For the few-hundred-triangle meshes involved this is a
bandwidth-friendly, perfectly regular workload that XLA vectorizes flat.

The intersection distance is differentiable w.r.t. the ray (origin and
direction) through the Möller–Trumbore solve, so attached shadow-ray
origins and reparameterized directions keep their gradients; mesh geometry
itself is held fixed (the reference never differentiates its auxiliary
meshes either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["TriangleMesh", "mesh_intersect", "mesh_intersect_full"]

_EPS = 1e-9


@struct.dataclass
class TriangleMesh:
    """Triangle soup in precomputed edge form (v0 + u·e1 + v·e2).

    ``albedo`` is PER-TRIANGLE (T, 3) Lambertian/specular reflectance and
    ``mirror`` a per-triangle material bit — an arbitrary shape set with
    per-shape materials collapses into one soup via :meth:`merge`, the
    TPU-native equivalent of the reference's Mitsuba shape list
    (``integrators/reparam.py:209-232``; its studio relight rig carries
    several shapes, ``figures/result_utils.py:48-76``).  ``material`` is
    the STATIC summary ∈ {"diffuse", "mirror", "mixed"} so integrators
    compile the delta-bounce path out of pure-diffuse scenes
    (opt_configs.py:257-273 mirror-opt keeps "mirror").
    """

    v0: jnp.ndarray      # (T, 3)
    e1: jnp.ndarray      # (T, 3)
    e2: jnp.ndarray      # (T, 3)
    n: jnp.ndarray       # (T, 3) unit geometric normals
    albedo: jnp.ndarray  # (T, 3) per-triangle reflectance
    material: str = struct.field(pytree_node=False, default="diffuse")
    mirror: jnp.ndarray = None  # (T,) bool, per-triangle delta-material bit

    def __post_init__(self):
        if self.mirror is None:
            object.__setattr__(
                self,
                "mirror",
                jnp.full((self.v0.shape[0],), self.material == "mirror", bool),
            )

    @classmethod
    def create(cls, vertices, faces, albedo=(0.5, 0.5, 0.5), material="diffuse"):
        assert material in ("diffuse", "mirror"), material
        v = jnp.asarray(vertices, jnp.float32)
        f = np.asarray(faces, np.int32)
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        e1, e2 = v1 - v0, v2 - v0
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
        alb = jnp.broadcast_to(
            jnp.asarray(albedo, jnp.float32), (v0.shape[0], 3)
        )
        return cls(v0=v0, e1=e1, e2=e2, n=n, albedo=alb, material=material)

    @classmethod
    def merge(cls, meshes):
        """Concatenate several meshes (each with its own material) into one
        soup — multi-shape scene assembly (VERDICT r3 #6)."""
        meshes = list(meshes)
        assert meshes, "merge() needs at least one mesh"
        if len(meshes) == 1:
            return meshes[0]
        mats = {m.material for m in meshes}
        material = mats.pop() if len(mats) == 1 else "mixed"
        cat = lambda f: jnp.concatenate([f(m) for m in meshes], axis=0)
        return cls(
            v0=cat(lambda m: m.v0), e1=cat(lambda m: m.e1),
            e2=cat(lambda m: m.e2), n=cat(lambda m: m.n),
            albedo=cat(lambda m: m.albedo), material=material,
            mirror=cat(lambda m: m.mirror),
        )

    @classmethod
    def rect(cls, corner, e0, e1, albedo=(0.5, 0.5, 0.5), material="diffuse"):
        """Parallelogram ``corner + s·e0 + t·e1`` as two triangles (the
        mirror plane / backdrop card of the reference's mixed scenes)."""
        c = np.asarray(corner, np.float32)
        a = np.asarray(e0, np.float32)
        b = np.asarray(e1, np.float32)
        verts = [c, c + a, c + a + b, c + b]
        return cls.create(verts, [[0, 1, 2], [0, 2, 3]], albedo, material)

    @classmethod
    def floor(cls, height=0.0, half_extent=10.0, albedo=(0.5, 0.5, 0.5),
              center_xz=(0.5, 0.5), material="diffuse"):
        """Axis-aligned y=height quad — the canonical auxiliary mesh,
        centered under the unit-cube SDF domain by default."""
        h, s = float(height), float(half_extent)
        cx, cz = (float(c) for c in center_xz)
        verts = [[cx - s, h, cz - s], [cx + s, h, cz - s],
                 [cx + s, h, cz + s], [cx - s, h, cz + s]]
        return cls.create(verts, [[0, 2, 1], [0, 3, 2]], albedo, material)

    @property
    def n_triangles(self):
        return self.v0.shape[0]


def _intersect_chunk(v0, e1, e2, tn, alb, mir, o, d, mint, maxt):
    """Möller–Trumbore of rays (..., 3) against a (C, 3) triangle chunk.

    Returns the per-lane nearest (t, normal, albedo, mirror-bit) over the
    chunk, t = +inf miss.
    """
    ox = o[..., None, :]          # (..., 1, 3)
    dx = d[..., None, :]
    pvec = jnp.cross(dx, e2)      # (..., C, 3)
    det = jnp.sum(pvec * e1, -1)  # (..., C)
    det_safe = jnp.where(jnp.abs(det) > _EPS, det, 1.0)  # NaN-free VJP on degenerate lanes
    inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det_safe, 0.0)
    tvec = ox - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dx * qvec, -1) * inv_det
    t = jnp.sum(e2 * qvec, -1) * inv_det
    hit = (
        (jnp.abs(det) > _EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > mint[..., None])
        & (t < maxt[..., None])
    )
    t = jnp.where(hit, t, jnp.inf)
    j = jnp.argmin(jax.lax.stop_gradient(t), axis=-1)       # (...,)
    t_best = jnp.take_along_axis(t, j[..., None], -1)[..., 0]
    n_best = tn[j]                                          # (..., 3)
    return t_best, n_best, alb[j], mir[j]


def mesh_intersect_full(mesh: TriangleMesh, o, d, mint=1e-4, maxt=jnp.inf, chunk: int = 128):
    """Nearest-hit distance, geometric normal and hit-triangle material
    attributes of rays against ``mesh``.

    Rays ``o``/``d``: (..., 3).  Returns ``(t, n, albedo, mirror)`` with
    ``t = +inf`` on miss, a zero-safe normal, the hit triangle's (..., 3)
    reflectance and its (...,) delta-material bit (multi-shape scenes,
    reference reparam.py:209-232).  Triangles are processed in static
    chunks via ``lax.scan`` so lane-count × triangle-count intermediates
    stay bounded (the wavefront is already large).  The normal is oriented
    to face the ray (two-sided, like the reference's auxiliary geometry).
    """
    mint = jnp.broadcast_to(jnp.asarray(mint, o.dtype), o.shape[:-1])
    maxt = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), o.shape[:-1])
    T = mesh.n_triangles
    if T <= chunk:
        t, n, alb, mir = _intersect_chunk(
            mesh.v0, mesh.e1, mesh.e2, mesh.n, mesh.albedo, mesh.mirror,
            o, d, mint, maxt,
        )
    else:
        pad = (-T) % chunk
        def padded(x):
            z = jnp.zeros((pad,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, z], 0) if pad else x
        v0, e1, e2, tn, alb3 = (padded(x).reshape(-1, chunk, 3)
                                for x in (mesh.v0, mesh.e1, mesh.e2, mesh.n, mesh.albedo))
        mirc = padded(mesh.mirror).reshape(-1, chunk)
        # degenerate padding triangles (e1 = e2 = 0) never report a hit

        def body(carry, tri):
            tb, nb, ab, mb = carry
            tc, nc, ac, mc = _intersect_chunk(*tri, o, d, mint, maxt)
            closer = tc < tb
            c3 = closer[..., None]
            return (jnp.where(closer, tc, tb), jnp.where(c3, nc, nb),
                    jnp.where(c3, ac, ab), jnp.where(closer, mc, mb)), None

        init = (jnp.full(o.shape[:-1], jnp.inf, o.dtype), jnp.zeros(o.shape, o.dtype),
                jnp.zeros(o.shape, o.dtype), jnp.zeros(o.shape[:-1], bool))
        (t, n, alb, mir), _ = jax.lax.scan(body, init, (v0, e1, e2, tn, alb3, mirc))
    n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0.0, -n, n)
    return t, n, alb, mir


def mesh_intersect(mesh: TriangleMesh, o, d, mint=1e-4, maxt=jnp.inf, chunk: int = 128):
    """Nearest-hit ``(t, n)`` only (occlusion queries and legacy callers)."""
    t, n, _, _ = mesh_intersect_full(mesh, o, d, mint, maxt, chunk)
    return t, n
