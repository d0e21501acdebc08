"""Device-mesh sharding: rays within a view, views across the mesh.

The distribution subsystem the reference lacks entirely (SURVEY.md §2.4):

  * mesh axes ``('views', 'rays')`` — data-parallel over sensors ×
    wavefront-parallel within a view;
  * the SDF grid and all optimizer state are **replicated** (64³–256³
    floats = 1–64 MiB ≪ HBM), so the only collectives are
      - a ``psum`` of film blocks over 'rays' (one per render), and
      - a ``psum`` of parameter gradients + loss over the whole mesh
        (the NCCL-allreduce analog), which XLA overlaps with the backward;
  * per-lane RNG is keyed by *global* lane index
    (``ops/sampling.lane_uniforms``), so any mesh shape reproduces the
    single-chip estimate bit-for-bit.

Multi-host: the same code runs under ``jax.distributed.initialize`` — the
mesh spans all processes' devices and ``jax.make_mesh`` lays 'views' across
DCN and 'rays' across ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.integrator import RenderConfig, render_lane_block
from ..ops.film import BORDER, develop

__all__ = ["make_mesh", "render_sharded", "sharded_view_grads"]


def make_mesh(n_views_axis: int | None = None, devices=None) -> Mesh:
    """Build a ('views', 'rays') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_views_axis is None:
        n_views_axis = 2 if n % 2 == 0 and n > 1 else 1
    n_rays = n // n_views_axis
    assert n_views_axis * n_rays == n, (n_views_axis, n)
    arr = np.asarray(devices).reshape(n_views_axis, n_rays)
    return Mesh(arr, ("views", "rays"))


def _lane_count(camera, cfg: RenderConfig) -> int:
    b = BORDER if cfg.sample_border else 0
    return (camera.resx + 2 * b) * (camera.resy + 2 * b) * cfg.spp


def render_sharded(scene, camera, seed, cfg: RenderConfig, mesh: Mesh, mode="primal", axis="rays"):
    """Single-view render with the wavefront sharded over ``axis``.

    Each shard renders its slice of the lane axis into a local film block;
    blocks are psum-reduced over the mesh axis and developed.  The lane
    count must divide evenly over the shard count (lane counts are
    film-size × spp, so pick spp divisible by the rays-axis width).
    """
    n = _lane_count(camera, cfg)
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (
        f"lane count {n} must divide evenly over {n_shards} ray shards; "
        "choose spp divisible by the shard count"
    )
    lane = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
    )
    def run(scene_rep, lane_slice):
        block = render_lane_block(scene_rep, camera, lane_slice, seed, cfg, mode)
        return jax.lax.psum(block, axis)

    block = run(scene, lane)
    b = BORDER if cfg.sample_border else 0
    return develop(block, border=b)


def sharded_view_grads(loss_and_grad_fn, params, view_indices, mesh: Mesh):
    """Data-parallel view batch: each 'views' mesh group computes the
    loss+grads of its view subset (with 'rays' sharding inside), psum over
    'views'.  ``loss_and_grad_fn(params, view_idx) -> (loss, grads)`` must
    already be 'rays'-sharded or replicated internally."""
    n_groups = mesh.shape["views"]
    vi = np.asarray(view_indices)
    assert len(vi) % n_groups == 0, (len(vi), n_groups)
    per = len(vi) // n_groups
    vi = jnp.asarray(vi.reshape(n_groups, per), jnp.int32)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P("views")), out_specs=P(),
        check_vma=False,
    )
    def run(params_rep, my_views):
        loss = jnp.zeros(())
        grads = jax.tree_util.tree_map(jnp.zeros_like, params_rep)
        for j in range(per):
            l, g = loss_and_grad_fn(params_rep, my_views[0, j])
            loss = loss + l
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
        loss = jax.lax.psum(loss, "views")
        grads = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "views"), grads)
        return loss, grads

    return run(params, vi)
