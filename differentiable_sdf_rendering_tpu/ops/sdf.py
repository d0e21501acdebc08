"""SDF shape representations as JAX pytrees.

Functional re-design of the reference's ``SDFBase``/``Grid3d``/``SphereSDF``/
``BoxSDF`` hierarchy (``/root/reference/python/shapes.py:25-554``): shapes are
immutable pytree dataclasses; evaluation functions are pure and batched over
arbitrary leading dims, so they compose with ``jit``/``vmap``/``grad``/mesh
sharding.  Tracer hyper-parameters live in the static ``TraceParams``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from . import grid as gridops

__all__ = [
    "TraceParams",
    "GridSDF",
    "SphereSDF",
    "BoxSDF",
    "sdf_bbox",
]


@dataclasses.dataclass(frozen=True)
class TraceParams:
    """Sphere-tracer hyper-parameters (static under jit).

    Defaults mirror ``/root/reference/python/shapes.py:28-41``.
    """

    step_scale: float = 1.0
    # Over-relaxation factor for the *non-differential* trace (Keinert et
    # al. 2014): step λ·|f| with fallback when spheres stop overlapping.
    # 1.0 = off (reference-parity default); 1.2–1.6 cuts step counts ~25%.
    over_relax: float = 1.0
    trace_eps: float = 1e-6
    refine_intersection: bool = True
    # Intersection root polisher (ops/trace._refine): 'fixed' = the
    # reference's decreasing-rate iteration (bit-faithful to
    # shapes.py:244-257; default), 'newton' = guarded Newton toward the ε/2
    # band center (~2 evals instead of ~10).  Both accept the identical
    # 0 < f ≤ ε band.  r5 retest (scripts/newton_retest_r5.py, warm-
    # execution protocol, both orderings): Newton ≡ fixed within 1% at
    # both trace (49.0 vs 49.2 ms) and primal-slice (76.8 vs 77.7 ms)
    # level — the r4 "444 ms pathology" was a cold-executable measurement
    # artifact (the first-timed executable of a process absorbs ~300-450 ms
    # of axon session warmup).  The refine loop is machinery-bound, not
    # eval-bound, so Newton's fewer evals don't pay; 'fixed' stays the
    # default for reference bit-parity.
    refine: str = "fixed"
    use_extra_weight: bool = True
    extra_thresh: float = 0.05
    sil_weight_offset: float = 0.05
    sil_weight_epsilon: float = 1e-6
    weight_power: int = 3
    use_weight_sum_weight: bool = True
    max_steps: int = 192
    refine_steps: int = 10
    bbox_expand: float = 0.05
    # Active-lane compaction schedule for the trace while_loop (see
    # ops/trace._staged_while): run the full batch until ≤ N/8 lanes remain,
    # gather the stragglers into an N/8 buffer, continue, then N/64.
    # Trip-count skew makes the lockstep wavefront pay the worst lane's
    # steps for the whole batch; compaction bounds that cost.  () = off.
    # (4,16,128) measured fastest on v5e at 262k lanes (62.5 ms vs 73.6 for
    # (8,64) per fwd trace, r2 device sweep) — earlier stages retire the
    # straggler tail before it taxes full-width iterations.
    compact_stages: tuple = (4, 16, 128)
    # Masked trace-body evaluations per while_loop iteration (ops/trace
    # ._staged_while): >1 amortizes the TPU loop's fixed per-iteration cost
    # at ≤(unroll−1) wasted tail evals per lane.  its_t/warp_t/weight_sum
    # are bit-identical at any setting (all body updates are active-masked);
    # the warp derivative accumulators match only to FMA-reassociation
    # level (~3e-5 rel), which the warp_t_d cancellation can amplify to
    # ~1% on near-surface lanes — far inside the estimator's FD tolerance.
    unroll: int = 1


@struct.dataclass
class GridSDF:
    """Dense-voxel SDF in the unit cube (reference ``Grid3d``, shapes.py:375).

    Attributes:
      data: (Z, Y, X) float32 signed distances.
      p:    (3,) translation of the unit cube (differentiable; the
            ``sdf.p`` parameter used by forward-gradient validation).
    """

    data: jnp.ndarray
    p: jnp.ndarray
    stencil: jnp.ndarray | None = None  # build_stencil(data) cache (see prepare())

    @classmethod
    def create(cls, data, p=None):
        data = jnp.asarray(data, jnp.float32)
        if data.ndim == 4:  # tolerate trailing channel dim (.vol convention)
            data = data[..., 0]
        if p is None:
            p = jnp.zeros((3,), jnp.float32)
        return cls(data=data, p=jnp.asarray(p, jnp.float32))

    def prepare(self):
        """Cache the contiguous-row stencil table for interpolation (one
        64-float gather row per query instead of 64 scalar taps — the
        measured-fastest TPU formulation; gradients flow data → stencil →
        taps).  No-op for grids too large for the 64× table
        (``gridops.stencil_ok``).

        WARNING: the cache is derived state — after ``.replace(data=...)``
        on a prepared SDF you must either re-``prepare()`` or drop the
        cache (``.replace(data=..., stencil=None)``), otherwise evaluation
        silently reads the stale grid (and the new data gets zero
        gradient).  ``with_data`` does the right thing."""
        if not gridops.stencil_ok(self.data):
            return self.replace(stencil=None)
        z, y, x = self.data.shape[-3], self.data.shape[-2], self.data.shape[-1]
        rows = (z + 3) * (y + 3) * (x + 3)
        if rows > gridops._INCREMENTAL_BUILD_ROWS:
            if isinstance(self.data, jax.core.Tracer):
                # 256³-class grids must be prepared EAGERLY (the traceable
                # builder's transients RESOURCE_EXHAUST the chip); declining
                # here keeps in-jit auto-prepare on the safe per-tap path
                return self.replace(stencil=None)
            # eager column-wise builder: peaks at ~the table itself
            return self.replace(stencil=gridops.build_stencil_incremental(self.data))
        return self.replace(stencil=gridops.build_stencil(self.data))

    def with_data(self, data):
        """Replace the grid, keeping the derived-table cache coherent."""
        out = self.replace(data=data, stencil=None)
        if self.stencil is not None:
            out = out.prepare()
        return out

    @property
    def resolution(self):
        return self.data.shape

    def eval(self, x):
        return gridops.grid_eval(self.data, x - self.p, self.stencil)

    def eval_and_grad(self, x):
        return gridops.grid_eval_grad(self.data, x - self.p, self.stencil)

    def eval_grad(self, x):
        return gridops.grid_eval_grad(self.data, x - self.p, self.stencil)[1]

    def eval_all(self, x):
        """(value, grad, hessian) jet — reference ``eval_all`` shapes.py:438."""
        return gridops.grid_eval_all(self.data, x - self.p, self.stencil)

    def bbox(self, expand: float = 0.05):
        p = jax.lax.stop_gradient(self.p)
        return p - expand, p + 1.0 + expand


@struct.dataclass
class SphereSDF:
    """Analytic sphere SDF used as a test oracle (shapes.py:486-537)."""

    p: jnp.ndarray  # (3,) center
    r: jnp.ndarray  # () radius

    @classmethod
    def create(cls, p=(0.5, 0.5, 0.5), r=0.3):
        return cls(p=jnp.asarray(p, jnp.float32), r=jnp.asarray(r, jnp.float32))

    def eval(self, x):
        return jnp.linalg.norm(x - self.p, axis=-1) - self.r

    def eval_and_grad(self, x):
        d = x - self.p
        n = jnp.linalg.norm(d, axis=-1)
        return n - self.r, d / jnp.maximum(n, 1e-20)[..., None]

    def eval_grad(self, x):
        return self.eval_and_grad(x)[1]

    def eval_all(self, x):
        d = x - self.p
        n2 = jnp.sum(d * d, axis=-1)
        n = jnp.sqrt(n2)
        v = n - self.r
        inv_n = 1.0 / jnp.maximum(n, 1e-20)
        g = d * inv_n[..., None]
        # Hessian of |x - p|: (I - g g^T) / |x - p|
        eye = jnp.eye(3, dtype=x.dtype)
        h = (eye - g[..., :, None] * g[..., None, :]) * inv_n[..., None, None]
        return v, g, h

    def bbox(self, expand: float = 0.05):
        p = jax.lax.stop_gradient(self.p)
        return p - 0.5 - expand, p + 0.5 + expand


@struct.dataclass
class BoxSDF:
    """Smooth box SDF (iquilezles.org; reference shapes.py:539-554)."""

    p: jnp.ndarray        # (3,) center
    extents: jnp.ndarray  # (3,) half-extents
    smoothing: jnp.ndarray  # () corner rounding

    @classmethod
    def create(cls, p=(0.0, 0.0, 0.0), extents=(0.49, 0.49, 0.49), smoothing=0.01):
        return cls(
            p=jnp.asarray(p, jnp.float32),
            extents=jnp.asarray(extents, jnp.float32),
            smoothing=jnp.asarray(smoothing, jnp.float32),
        )

    def eval(self, x):
        q = jnp.abs(x - self.p) - self.extents
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside - self.smoothing

    def eval_and_grad(self, x):
        v, g = jax.value_and_grad(lambda pt: self.eval(pt))(x) if x.ndim == 1 else (
            self.eval(x),
            jax.vmap(jax.grad(lambda pt: self.eval(pt)))(x.reshape(-1, 3)).reshape(x.shape),
        )
        return v, g

    def eval_grad(self, x):
        return self.eval_and_grad(x)[1]

    def eval_all(self, x):
        flat = x.reshape(-1, 3)
        v = self.eval(flat)
        g = jax.vmap(jax.grad(lambda pt: self.eval(pt)))(flat)
        h = jax.vmap(jax.hessian(lambda pt: self.eval(pt)))(flat)
        batch = x.shape[:-1]
        return v.reshape(batch), g.reshape(batch + (3,)), h.reshape(batch + (3, 3))

    def bbox(self, expand: float = 0.05):
        p = jax.lax.stop_gradient(self.p)
        return p - 0.5 - expand, p + 0.5 + expand


def sdf_bbox(sdf, expand: float = 0.05):
    return sdf.bbox(expand)
