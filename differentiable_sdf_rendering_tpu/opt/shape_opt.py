"""The shape-reconstruction training loop.

TPU-native re-design of the reference's ``optimize_shape``
(``/root/reference/python/shape_opt.py:32-132``): the whole per-iteration
body — primal renders, loss, the VJP through the reparameterized gradient
renders, regularizer, gradient validation, Adam, bbox clamp and eikonal
redistancing — is ONE jit-compiled step function.  Python only sequences
phases (film-resolution and grid-upsampling schedule boundaries change array
shapes, so each phase gets its own XLA specialization) and does I/O.

Faithful semantics:
  * primal image at ``spp·primal_spp_mult``, gradients pulled back through a
    separate ``spp``-sample reparameterized render with its own seed —
    exactly ``mi.render(..., spp, seed_grad, spp_grad)`` + ``dr.backward``
    (shape_opt.py:78-83);
  * strided view batches, per-view loss / batch_size;
  * seed bookkeeping ``seed += 1 + n_sensors`` per view (shape_opt.py:71-81);
  * Laplacian regularizer, grad clamp ±0.1, NaN suppression;
  * adaptive LR ``32/res · lr/(1+0.02 i)``; Adam state reset on upsampling
    (Mitsuba's Adam resets when a parameter changes shape);
  * EMA of parameters, checkpoints every 64 iters, metadata dump.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from ..models.camera import regular_cameras, regular_cameras_top
from ..models.integrator import RenderConfig, render, render_chunked, render_lane_block
from ..models.scene import Scene
from ..ops.film import BORDER, develop
from ..models.scenes_zoo import scene_rig_full, target_sdf
from ..ops.initializers import upsample_sdf, upsample_volume
from ..ops.sdf import GridSDF
from . import losses as losses_mod
from .adam import adam_init, adam_step
from .configs import BaseConfig
from .opt_configs import SdfConfig
from ..ops.grid import stencil_ok as gridops_stencil_ok
from .regularizations import discrete_laplacian_reg
from .variables import SdfVariableSpec, ema_update

__all__ = ["optimize_shape", "render_reference_images", "load_checkpoint", "OptimizationResult"]

_LOSSES = {
    "l1": losses_mod.l1,
    "l2": losses_mod.l2,
    "mape": losses_mod.mape,
    "multiscale_l1": losses_mod.multiscale_l1,
}

# Above this per-step lane-work estimate (batch · padded-pixels ·
# (primal_spp + 3·grad_spp)), 'auto' dispatch switches to the host-sliced
# step: the proven-safe one-dispatch ceiling is the no-tex-12 final phase
# (≈47 M, a 19-22 s execution), while the hq final phase (≈181 M, ≈90 s)
# crashed the worker 3× (BASELINE.md r3).
_HOST_DISPATCH_LANES = 80_000_000

# Largest stencil table (rows) allowed on the GRADIENT path: above this the
# padded table + its padded VJP cotangent exceed HBM (256³ = 17.4M rows =
# 2×8.28 GB padded — observed hqq compile OOM, r5); the grad render then
# uses the per-tap path (d/ddata scatters into the raw grid).
_GRAD_TABLE_MAX_ROWS = 8_000_000


def _grad_remat_auto(pw: int, grad_spp: int) -> bool:
    """Whether the training gradient render rematerializes its chunk scan.

    Storing residuals instead (remat=False) removes the VJP's second
    forward pass — measured ~25% of the gradient render — but keeps the
    WHOLE grad wavefront's residuals live.  The no-tex-12 final phase
    (132²·64 ≈ 1.1 M grad lanes) fits the v5e's 15.75 GB comfortably;
    beyond ~2 M lanes residuals reach double-digit GB (the r1 17 GB OOM
    class), so remat stays on.  Override with DSDF_GRAD_REMAT=0/1."""
    env = os.environ.get("DSDF_GRAD_REMAT")
    if env in ("0", "1"):
        return env == "1"
    # r5 controlled A/B (scripts/remat_ab_r5.py, 4 alternating 10-iter
    # 64³-final-phase blocks, same seeds): remat-off 18.85-18.92 s/iter vs
    # remat-on 23.7-23.9, ZERO stalls in either arm — the r4 stall
    # correlation was the degraded tunnel, not remat-off.  Residual storing
    # is therefore the default up to ~2 M grad lanes (the no-tex-12 final
    # phase is 1.1 M — measured fitting comfortably in 15.75 GB); beyond
    # that residuals reach double-digit GB (the r1 17 GB OOM class).
    return pw * grad_spp > 2_000_000


def _write_loss_plot(loss_values, output_dir):
    """Loss curve PNG/PDF (reference shape_opt.py:106-117)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(np.arange(len(loss_values)), loss_values)
        plt.xlabel("Iterations")
        plt.ylabel("Objective function value")
        if loss_values:
            avg = float(np.mean(np.asarray(loss_values)[-5:]))
            plt.title(f"Final loss: {100 * loss_values[-1]:.3f} (avg. over 5 its: {100 * avg:.3f})")
        plt.savefig(os.path.join(output_dir, "loss.pdf"))
        plt.savefig(os.path.join(output_dir, "loss.png"))
        plt.close()
    except Exception as e:  # plotting is best-effort
        print("loss plot skipped:", e)


@dataclasses.dataclass
class OptimizationResult:
    params: dict
    ema: dict
    loss_values: list
    total_time: float
    scene: object


def _make_cameras(opt_cfg: SdfConfig, resx, resy):
    fn = regular_cameras_top if opt_cfg.cameras_top else regular_cameras
    return fn(opt_cfg.n_sensors, opt_cfg.angle_shift, resx, resy)


@functools.lru_cache(None)
def _attach_tables() -> bool:
    """Whether training renders attach the stencil gather table (one
    contiguous 64-float row per interpolation query instead of 64 scalar
    taps — the measured 7× adjoint lever on TPU, BASELINE.md).  Gradients
    flow data → table → taps through build_stencil's custom_vjp, so values
    match the per-tap path to float accumulation order
    (tests/test_grid.py::test_stencil_path_matches_clamped).  Defaults to
    on for TPU; override with DSDF_ATTACH_TABLES=0/1."""
    env = os.environ.get("DSDF_ATTACH_TABLES")
    if env in ("0", "1"):
        return env == "1"
    return jax.devices()[0].platform == "tpu"


def _build_scene(base: Scene, params: dict, sdf_table=None) -> Scene:
    if sdf_table is not None:
        # Attach the PREBUILT (eagerly built, between steps) stencil table:
        # building it in-jit under the step's remat scans materializes the
        # slice/stack construction with (N, 1) operands padded 128× by the
        # TPU tile — 69.8 GB of HLO temps at 128³ (observed compile OOM,
        # r3 iter bench).  attach_stencil routes d/dtable into d/ddata via
        # the hand-written transpose, so gradients are identical.
        from ..ops import grid as gridops

        sdf = base.sdf.replace(
            data=params["sdf"],
            stencil=gridops.attach_stencil(params["sdf"], sdf_table),
        )
    else:
        sdf = base.sdf.with_data(params["sdf"])
        if _attach_tables():
            sdf = sdf.prepare()  # self-gates on grid size (gridops.stencil_ok)
    bsdf = base.bsdf
    if "albedo" in params:
        if hasattr(bsdf, "base_color_tex"):
            bsdf = bsdf.replace(base_color_tex=params["albedo"])
        else:
            bsdf = bsdf.replace(albedo_tex=params["albedo"])
    if "roughness" in params and hasattr(bsdf, "roughness_tex"):
        bsdf = bsdf.replace(roughness_tex=params["roughness"])
    return base.replace(sdf=sdf, bsdf=bsdf)


def render_reference_images(scene: Scene, opt_cfg: SdfConfig, ref_spp: int = 512, cfg: RenderConfig | None = None):
    """Render per-view references at full res + the multiscale pyramid
    (optimize.py:11-29 with seed ``idx+41``; shape_opt.py:16-29).

    Bounded programs: the wavefront is chunked to ≤ ~300 k lanes per
    program (larger single programs have crashed the v5e worker), and the
    target SDF's gather table is prepared EAGERLY so the remat chunk scan
    never traces the in-jit table build (the 128×-padded construction
    compile-OOMs at 128³ — see _build_scene)."""
    cfg = dataclasses.replace(cfg or RenderConfig(), spp=ref_spp)
    refs = {}
    fullres = (opt_cfg.resx, opt_cfg.resy)
    per_view = []
    if _attach_tables() and scene.sdf.stencil is None:
        scene = scene.replace(sdf=scene.sdf.prepare())  # eager table build
    b = BORDER if cfg.sample_border else 0
    n_lanes = (opt_cfg.resx + 2 * b) * (opt_cfg.resy + 2 * b) * ref_spp
    n_chunks = ref_spp  # fallback: one-spp chunks
    for c in range(1, ref_spp + 1):  # smallest spp divisor bounding the chunk
        if ref_spp % c == 0 and n_lanes // c <= 300_000:
            n_chunks = c
            break
    rfun = jax.jit(
        lambda scene, cam, seed: render_chunked(
            scene, seed=seed, cfg=cfg, mode="primal", camera=cam, n_chunks=n_chunks
        )
    )
    for v in range(opt_cfg.n_sensors):
        img = rfun(scene, scene.cameras.view(v), v + 41)[..., :3]
        per_view.append(img)
    refs[fullres] = jnp.stack(per_view)
    # pyramid for the multiscale-rendering schedule
    res = fullres
    cur = refs[fullres]
    while min(res) > 8:
        res = (res[0] // 2, res[1] // 2)
        cur = jax.vmap(losses_mod.downsample_half)(cur)
        refs[res] = cur
    return refs


def _local_lane_block(scene, cam, seed, cfg: RenderConfig, mode, n_chunks, ray_axis, n_ray_shards):
    """This shard's un-normalized film block: its contiguous slice of the
    global lane space, chunked through a rematerialized scan like
    :func:`render_chunked`.  RNG is keyed by global lane id, so psum of the
    shard blocks equals the single-device block up to float accumulation
    order (SURVEY.md §2.4 deterministic per-ray RNG).  Contains NO
    collectives — so it is safe to ``jax.vjp`` under ``check_vma=False``
    (transposing a psum there would double-count the cotangent)."""
    W, H = cam.resx, cam.resy
    b = BORDER if cfg.sample_border else 0
    pw = (W + 2 * b) * (H + 2 * b)
    n = pw * cfg.spp
    assert n % (n_ray_shards * n_chunks) == 0, (n, n_ray_shards, n_chunks)
    sz = n // (n_ray_shards * n_chunks)
    base_off = jax.lax.axis_index(ray_axis).astype(jnp.uint32) * jnp.uint32(n // n_ray_shards)

    if pw % n_ray_shards == 0 and cfg.spp % n_chunks == 0:
        # SPP-STRIDED chunks over this shard's contiguous pixel range (see
        # render_chunked: mixing all pixels into every chunk beats
        # contiguous few-pixel chunks 1.8× on v5e).  Same global lane ids.
        pw_l = pw // n_ray_shards
        k = cfg.spp // n_chunks
        i = jnp.arange(pw_l * k, dtype=jnp.uint32)
        pix_base = jax.lax.axis_index(ray_axis).astype(jnp.uint32) * jnp.uint32(pw_l)
        base = (pix_base + i // k) * jnp.uint32(cfg.spp) + (i % k)
        groups = k

        def lane_of(c):
            return base + c * jnp.uint32(k)
    else:
        groups = None

        def lane_of(c):
            return base_off + c * jnp.uint32(sz) + jnp.arange(sz, dtype=jnp.uint32)

    @jax.checkpoint
    def body(carry, c):
        return carry + render_lane_block(
            scene, cam, lane_of(c), seed, cfg, mode, dense_groups=groups
        ), None

    init = jnp.zeros((H + 2 * b, W + 2 * b, 5), jnp.float32)
    block, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.uint32))
    return block


def _render_view_sharded(scene, cam, seed, cfg: RenderConfig, mode, n_chunks, ray_axis, n_ray_shards):
    """Lane-sharded chunked render INSIDE a shard_map: local block, psum
    over the 'rays' mesh axis, develop.  (Primal/detached use only — for
    gradients vjp :func:`_local_lane_block` and keep the psum outside.)"""
    b = BORDER if cfg.sample_border else 0
    block = _local_lane_block(scene, cam, seed, cfg, mode, n_chunks, ray_axis, n_ray_shards)
    return develop(jax.lax.psum(block, ray_axis), border=b)


def _view_batch_loss_grads(
    params, base, view_indices, seeds, seeds_grad, refs, sdf_table=None,
    *, loss_name, cfg_primal, cfg_grad, batch, render_chunks, mesh,
    grad_remat: bool = True,
):
    """Loss + parameter gradients of a strided view batch — the SPMD core of
    the training step.  With ``mesh=None`` this is a lax.scan over views on
    one device; with a ('views','rays') mesh the batch is split across view
    groups and each view's wavefront across ray shards, reduced by psum (the
    distribution subsystem of SURVEY.md §2.4 applied to the production loop,
    parallelizing the reference's sequential per-sensor loop,
    /root/reference/python/shape_opt.py:77-86)."""
    loss_fn = _LOSSES[loss_name]

    def one_view(params_a, base_a, table_a, vidx, seed_p, seed_g, ref, render_view, grad_backprop):
        cam = base_a.cameras.view(vidx)
        scene_det = _build_scene(
            jax.lax.stop_gradient(base_a), jax.lax.stop_gradient(params_a),
            jax.lax.stop_gradient(table_a) if table_a is not None else None,
        )
        # chunking bounds the live wavefront (lax.scan over lane chunks with
        # a rematerialized body) — required for hq/hqq film sizes on single
        # chips (CLAUDE.md: HBM limits); bit-compatible up to float
        # accumulation order.
        img_p = render_view(scene_det, cam, seed_p, cfg_primal, "primal")[..., :3]
        lval, dimg = jax.value_and_grad(lambda im: loss_fn(im, ref) / batch)(img_p)
        gp = grad_backprop(params_a, base_a, table_a, cam, seed_g, dimg)
        return lval, gp

    def scan_views(params_a, base_a, table_a, vis, sps, sgs, rfs, render_view, grad_backprop):
        # ONE copy of the render+vjp program regardless of batch size (the
        # reference re-dispatches per sensor; the scan keeps compile time
        # and live memory independent of the batch).
        @jax.checkpoint
        def view_body(carry, xs):
            loss_acc, grads_acc = carry
            vidx, seed_p, seed_g, ref = xs
            lval, gp = one_view(
                params_a, base_a, table_a, vidx, seed_p, seed_g, ref,
                render_view, grad_backprop
            )
            return (loss_acc + lval, jax.tree_util.tree_map(jnp.add, grads_acc, gp)), None

        # NOTE zeros from shape/dtype, NOT zeros_like: inside the Manual
        # shard_map context, zeros_like of a param that was produced by a
        # previous sharded step (and so carries a NamedSharding with Auto
        # axis types on the same mesh) is rejected by JAX.
        zeros = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, x.dtype), params_a)
        init = (jnp.zeros(()), zeros)
        (loss, grads), _ = jax.lax.scan(view_body, init, (vis, sps, sgs, rfs))
        return loss, grads

    if mesh is None:
        def render_view(scene, cam, seed, cfg, mode):
            return render_chunked(scene, seed=seed, cfg=cfg, mode=mode, camera=cam, n_chunks=render_chunks)

        def grad_backprop(params_a, base_a, table_a, cam, seed_g, dimg):
            def rfun(p):
                # grad_remat=False stores the chunk-scan residuals so the
                # VJP skips its second forward pass (VERDICT r3 #4) — gated
                # on the grad wavefront size by the caller.
                return render_chunked(
                    _build_scene(base_a, p, table_a), seed=seed_g,
                    cfg=cfg_grad, mode="grad", camera=cam,
                    n_chunks=render_chunks, remat=grad_remat,
                )[..., :3]

            _, vjp = jax.vjp(rfun, params_a)
            (gp,) = vjp(dimg)
            return gp

        return scan_views(
            params, base, sdf_table, view_indices, seeds, seeds_grad, refs,
            render_view, grad_backprop
        )

    n_vg = mesh.shape["views"]
    n_rs = mesh.shape["rays"]
    assert batch % n_vg == 0, (
        f"view batch {batch} must divide evenly over the {n_vg}-group 'views' mesh axis"
    )
    per = batch // n_vg
    vi = view_indices.reshape(n_vg, per)
    sp = seeds.reshape(n_vg, per)
    sg = seeds_grad.reshape(n_vg, per)
    rf = refs.reshape((n_vg, per) + refs.shape[1:])

    def render_view(scene, cam, seed, cfg, mode):
        return _render_view_sharded(scene, cam, seed, cfg, mode, render_chunks, "rays", n_rs)

    def grad_backprop(params_a, base_a, table_a, cam, seed_g, dimg):
        # The differentiated function must contain NO collectives (psum's
        # transpose under check_vma=False is another psum — it would
        # multiply the cotangent by the shard count).  Chain manually:
        # vjp(local block) ∘ psum ∘ vjp(develop): dimg → dB is the same on
        # every shard (B and dimg are replicated), each shard backprops dB
        # through ITS lanes only, and the caller psums the partial grads.
        b = BORDER if cfg_grad.sample_border else 0

        def block_fn(p):
            return _local_lane_block(
                _build_scene(base_a, p, table_a), cam, seed_g, cfg_grad, "grad",
                render_chunks, "rays", n_rs,
            )

        blk, vjp_blk = jax.vjp(block_fn, params_a)
        B = jax.lax.psum(blk, "rays")
        _, vjp_dev = jax.vjp(lambda B: develop(B, border=b)[..., :3], B)
        (dB,) = vjp_dev(dimg)
        (gp,) = vjp_blk(dB)
        return gp

    # Everything array-valued enters through shard_map ARGUMENTS (not
    # closures): closure-captured arrays that were produced by a previous
    # sharded step carry Auto-axis NamedShardings that the Manual context
    # rejects; in_specs-passed arrays are resharded cleanly.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("views"), P("views"), P("views"), P("views")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(params_a, base_a, table_a, vis, sps, sgs, rfs):
        loss, grads = scan_views(
            params_a, base_a, table_a, vis[0], sps[0], sgs[0], rfs[0],
            render_view, grad_backprop
        )
        # loss is replicated across 'rays' (each ray shard sees the full
        # psum'ed film); grads are partial per ray shard AND per view group.
        loss = jax.lax.psum(loss, "views")
        grads = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, ("views", "rays")), grads)
        return loss, grads

    return run(params, base, sdf_table, vi, sp, sg, rf)


def _finish_step(params, adam_state, ema, grads, total_loss, lrs, *, specs, mask_updates):
    """Shared step tail: SDF regularizer, gradient validation, Adam,
    parameter validation (clamps + redistancing), EMA.  Called from inside
    the one-dispatch :func:`_train_step` and, jitted on its own, from the
    host-sliced step (reference shape_opt.py:89-105 semantics either way)."""
    spec_by_key = {s.key: s for s in specs}

    # Laplacian regularizer on the SDF (shape_opt.py:89-92)
    sdf_spec: SdfVariableSpec = spec_by_key["sdf"]
    if sdf_spec.regularizer_weight > 0:
        rval, rg = jax.value_and_grad(
            lambda s: sdf_spec.regularizer_weight * discrete_laplacian_reg(s)
        )(params["sdf"])
        grads = dict(grads)
        grads["sdf"] = grads["sdf"] + rg
        total_loss = total_loss + rval

    # gradient validation (variables.py:193-199)
    for k in grads:
        grads[k] = spec_by_key[k].validate_gradient(grads[k])

    new_params, new_state = adam_step(params, grads, adam_state, lrs, mask_updates=mask_updates)

    # parameter validation: clamps + redistancing (upsampling happens
    # outside the jit at phase boundaries)
    for k in new_params:
        new_params[k] = spec_by_key[k].validate(new_params[k], int(-1))

    new_ema = {
        k: ema_update(ema.get(k), new_params[k], spec_by_key[k].beta)
        if spec_by_key[k].beta is not None
        else new_params[k]
        for k in new_params
    }
    return new_params, new_state, new_ema, total_loss


_finish_step_jit = jax.jit(_finish_step, static_argnames=("specs", "mask_updates"))


# ---------------------------------------------------------------------------
# Host-sliced training step (hq/hqq scales)
#
# The one-dispatch _train_step at the hq final phase (6 views × 256² film ×
# 320 spp at 128³) is ≈90 s of device time in ONE XLA execution — and that
# program crashed the v5e worker three times (BASELINE.md r3; recovery takes
# 30-100 min per crash).  The same arithmetic dispatched as bench.py-class
# slices (≤ ~300 k lanes per program, async-enqueued) runs reliably, so at
# large scales the step is sequenced from the HOST: per view, spp-strided
# primal slices accumulate the film block on device; the loss cotangent is
# pulled back through develop at the grad-mode block; per-slice VJPs
# accumulate parameter gradients on device.  Cost = 2×forward + backward per
# grad sample — identical to the rematerialized chunk scan it replaces (its
# jax.checkpoint re-runs the grad forward inside the VJP too).  Values match
# the one-dispatch step to float accumulation order: same lane ids, same
# sample set, same seeds.
# ---------------------------------------------------------------------------


@functools.lru_cache(None)
def _u32(c: int):
    """Cached device scalar: a fresh ``jnp.uint32(c)`` per dispatch is a
    blocking host→device put (~27 ms each through the axon tunnel — ~576
    per hq iteration before caching)."""
    return jnp.uint32(c)


def _host_slice_spp(pw: int, spp: int, max_lanes: int) -> int:
    """Largest divisor k of ``spp`` with ``pw·k ≤ max_lanes`` (min 1)."""
    k = max(1, min(spp, max_lanes // max(pw, 1)))
    while spp % k:
        k -= 1
    return k


def _strided_lane(pw: int, spp: int, k: int, c):
    """Slice ``c``'s spp-strided global lane ids: all pixels × spp-slots
    [c·k, (c+1)·k) — the TPU-preferred slicing (see render_chunked)."""
    i = jnp.arange(pw * k, dtype=jnp.uint32)
    return (i // k) * jnp.uint32(spp) + (i % k) + c * jnp.uint32(k)


@functools.partial(
    jax.jit,
    static_argnames=("base_treedef", "cfg", "k", "mode", "nb"),
    donate_argnums=(0,),
)
def _accum_block_slice(block, params, base_leaves, sdf_table, cam, c, seed,
                       *, base_treedef, cfg, k, mode, nb=1):
    """Accumulate ``nb`` consecutive spp-strided slices (starting at slice
    index ``c``) into ``block`` in ONE dispatch.  ``nb > 1`` bundles the
    slices as a ``lax.scan`` over the slice counter: each scan iteration is
    still a bench-class ≤ ~300 k-lane render (the proven-safe program
    envelope — the r3 worker crashes were single ~90 s executions, and an
    nb-bundle is ~nb × 0.1-0.3 s), but the host pays ONE dispatch instead of
    nb (~33 s of tunnel overhead per hq iteration at 576 dispatches/iter —
    VERDICT r4 #6).  Accumulation order is identical to nb=1, so results
    are bit-equal to the unbundled path."""
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)
    scene = _build_scene(base, params, sdf_table)
    b = BORDER if cfg.sample_border else 0
    pw = (cam.resx + 2 * b) * (cam.resy + 2 * b)
    if nb == 1:
        lane = _strided_lane(pw, cfg.spp, k, c)
        return block + render_lane_block(scene, cam, lane, seed, cfg, mode,
                                         dense_groups=k)

    def body(blk, ci):
        lane = _strided_lane(pw, cfg.spp, k, ci)
        return blk + render_lane_block(scene, cam, lane, seed, cfg, mode,
                                       dense_groups=k), None

    blk, _ = jax.lax.scan(body, block, c + jnp.arange(nb, dtype=jnp.uint32))
    return blk


@functools.partial(jax.jit, static_argnames=("loss_name", "batch", "border"))
def _loss_and_dimg(block, ref, *, loss_name, batch, border):
    img = develop(block, border=border)[..., :3]
    return jax.value_and_grad(lambda im: _LOSSES[loss_name](im, ref) / batch)(img)


@functools.partial(jax.jit, static_argnames=("border",))
def _develop_cotangent(block, dimg, *, border):
    _, vjp = jax.vjp(lambda B: develop(B, border=border)[..., :3], block)
    (dB,) = vjp(dimg)
    return dB


@functools.partial(
    jax.jit,
    static_argnames=("base_treedef", "cfg", "k", "nb"),
    donate_argnums=(0,),
)
def _accum_grads_slice(grads, params, base_leaves, sdf_table, cam, c, seed, dB,
                       *, base_treedef, cfg, k, nb=1):
    """Per-slice VJPs accumulated on device; ``nb`` slices per dispatch via
    ``lax.scan`` (see :func:`_accum_block_slice` — same envelope argument,
    same bit-equal accumulation order)."""
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)
    b = BORDER if cfg.sample_border else 0
    pw = (cam.resx + 2 * b) * (cam.resy + 2 * b)

    def one(g, ci):
        lane = _strided_lane(pw, cfg.spp, k, ci)

        def rf(p):
            scene = _build_scene(base, p, sdf_table)
            return render_lane_block(scene, cam, lane, seed, cfg, "grad",
                                     dense_groups=k)

        _, vjp = jax.vjp(rf, params)
        (gp,) = vjp(dB)
        return jax.tree_util.tree_map(jnp.add, g, gp)

    if nb == 1:
        return one(grads, c)
    g, _ = jax.lax.scan(lambda g, ci: (one(g, ci), None), grads,
                        c + jnp.arange(nb, dtype=jnp.uint32))
    return g


def _host_loss_grads(
    params, base_leaves, view_indices, seeds, seeds_grad, refs, sdf_table,
    *, base_treedef, loss_name, cfg_primal: RenderConfig,
    cfg_grad: RenderConfig, batch: int, max_lanes: int = 300_000,
):
    """Loss + parameter gradients of a view batch, sequenced as bench-class
    host dispatches — the host-sliced counterpart of
    :func:`_view_batch_loss_grads` (values match to float accumulation
    order: same lane ids, same sample set, same seeds)."""
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)
    b = BORDER if cfg_primal.sample_border else 0

    # Bundle size: nb slices ride one dispatch as a lax.scan.  The largest
    # divisor of the slice count ≤ DSDF_HOST_BUNDLE keeps exactly one
    # compiled program per (cfg, k, nb) while cutting the per-iteration
    # dispatch count ~nb× (~33 s/iter of tunnel overhead at hq's 576
    # dispatches — VERDICT r4 #6).
    nb_max = max(1, int(os.environ.get("DSDF_HOST_BUNDLE", "8")))

    def _bundle(n_slices: int) -> int:
        nb = min(nb_max, n_slices)
        while n_slices % nb:
            nb -= 1
        return nb

    grads = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, x.dtype), params)
    total_loss = jnp.zeros(())
    for j, v in enumerate([int(x) for x in view_indices]):
        cam = base.cameras.view(v)
        pw = (cam.resx + 2 * b) * (cam.resy + 2 * b)
        shape5 = (cam.resy + 2 * b, cam.resx + 2 * b, 5)
        seed_p, seed_g = seeds[j], seeds_grad[j]

        # primal film block (detached: never differentiated)
        kp = _host_slice_spp(pw, cfg_primal.spp, max_lanes)
        nbp = _bundle(cfg_primal.spp // kp)
        block = jnp.zeros(shape5, jnp.float32)
        for c in range(0, cfg_primal.spp // kp, nbp):
            block = _accum_block_slice(
                block, params, base_leaves, sdf_table, cam, _u32(c), seed_p,
                base_treedef=base_treedef, cfg=cfg_primal, k=kp, mode="primal",
                nb=nbp,
            )
        lval, dimg = _loss_and_dimg(
            block, refs[j], loss_name=loss_name, batch=batch, border=b
        )
        total_loss = total_loss + lval

        # grad-mode film block (the develop cotangent needs its value)
        kg = _host_slice_spp(pw, cfg_grad.spp, max_lanes)
        nbg = _bundle(cfg_grad.spp // kg)
        gblock = jnp.zeros(shape5, jnp.float32)
        for c in range(0, cfg_grad.spp // kg, nbg):
            gblock = _accum_block_slice(
                gblock, params, base_leaves, sdf_table, cam, _u32(c), seed_g,
                base_treedef=base_treedef, cfg=cfg_grad, k=kg, mode="grad",
                nb=nbg,
            )
        dB = _develop_cotangent(gblock, dimg, border=b)

        # per-slice VJPs, accumulated on device
        for c in range(0, cfg_grad.spp // kg, nbg):
            grads = _accum_grads_slice(
                grads, params, base_leaves, sdf_table, cam, _u32(c), seed_g, dB,
                base_treedef=base_treedef, cfg=cfg_grad, k=kg, nb=nbg,
            )
    return total_loss, grads


@functools.partial(
    jax.jit,
    static_argnames=("base_treedef", "loss_name", "cfg_primal", "cfg_grad",
                     "batch", "nc_primal", "nc_grad", "grad_remat"),
)
def _view_loss_grads_jit(params, base_leaves, sdf_table, vidx, seed_p, seed_g,
                         ref, *, base_treedef, loss_name, cfg_primal, cfg_grad,
                         batch, nc_primal, nc_grad, grad_remat):
    """Loss + parameter gradients of ONE view as a single jitted program —
    the per-VIEW host-dispatch granularity (r5).  Identical arithmetic to
    one view of the jitted `_train_step` (render_chunked primal +
    vjp-of-render_chunked grad); the program runs ~11-16 s at hq scale —
    the same proven-safe class as the no-tex-12 final-phase one-dispatch
    step (17-22 s) and far below the ~90 s single-execution crash regime.
    Measured vs the slice-granular path at hq: 96-98 s/iter → see
    BASELINE.md r5 (the slice path's per-program floors cost ~1.4×)."""
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)
    cam = base.cameras.view(vidx)
    loss_fn = _LOSSES[loss_name]
    scene_det = _build_scene(
        jax.lax.stop_gradient(base), jax.lax.stop_gradient(params),
        jax.lax.stop_gradient(sdf_table) if sdf_table is not None else None,
    )
    img_p = render_chunked(scene_det, seed=seed_p, cfg=cfg_primal,
                           mode="primal", camera=cam, n_chunks=nc_primal)[..., :3]
    lval, dimg = jax.value_and_grad(lambda im: loss_fn(im, ref) / batch)(img_p)

    # 256³-class tables CANNOT ride the gradient path: the T(8,128) tile
    # pads the fp32 (17.4M, 64) table to 8.28 GB and the VJP through
    # attach_stencil materializes an equally-padded table COTANGENT —
    # two such buffers alone exceed the 15.75 GB v5e (observed hqq compile
    # OOM, r5).  The primal/forward renders keep the table (no cotangent);
    # the gradient render falls back to the per-tap path, whose d/ddata
    # scatters go directly into the 256³ grid (64 MB).
    grad_table = sdf_table
    if sdf_table is not None and (
        sdf_table.shape[-1] == 128 or sdf_table.shape[0] > _GRAD_TABLE_MAX_ROWS
    ):
        grad_table = None

    def rfun(p):
        return render_chunked(
            _build_scene(base, p, grad_table), seed=seed_g, cfg=cfg_grad,
            mode="grad", camera=cam, n_chunks=nc_grad, remat=grad_remat,
        )[..., :3]

    _, vjp = jax.vjp(rfun, params)
    (gp,) = vjp(dimg)
    return lval, gp


def _host_chunks(pw: int, spp: int, max_lanes: int) -> int:
    """Chunk count for render_chunked so each chunk is ≤ ``max_lanes`` —
    the smallest divisor of pw·spp with lanes/chunk in budget."""
    n = pw * spp
    nc = max(1, -(-n // max_lanes))
    while n % nc:
        nc += 1
    return nc


def _host_loss_grads_view(
    params, base_leaves, view_indices, seeds, seeds_grad, refs, sdf_table,
    *, base_treedef, loss_name, cfg_primal: RenderConfig,
    cfg_grad: RenderConfig, batch: int, max_lanes: int, grad_remat: bool,
):
    """Per-VIEW host dispatches (default host mode): one jitted
    loss+grad program per view, accumulated on device."""
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)
    b = BORDER if cfg_primal.sample_border else 0
    cam0 = base.cameras.view(0)
    pw = (cam0.resx + 2 * b) * (cam0.resy + 2 * b)
    ncp = _host_chunks(pw, cfg_primal.spp, max_lanes)
    grad_max = max_lanes
    if sdf_table is not None and (
        sdf_table.shape[-1] == 128 or sdf_table.shape[0] > _GRAD_TABLE_MAX_ROWS
    ):
        # per-tap grad fallback (see _view_loss_grads_jit): the (N, 4, 4, 4)
        # tap tensor pads 32× under the T(4, 128) tile — bound the chunk to
        # keep that transient ~1 GB
        grad_max = min(grad_max, 131_072)
    ncg = _host_chunks(pw, cfg_grad.spp, grad_max)
    grads = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, x.dtype), params)
    total_loss = jnp.zeros(())
    for j, v in enumerate([int(x) for x in view_indices]):
        lval, gp = _view_loss_grads_jit(
            params, base_leaves, sdf_table, _u32(v), seeds[j], seeds_grad[j],
            refs[j], base_treedef=base_treedef, loss_name=loss_name,
            cfg_primal=cfg_primal, cfg_grad=cfg_grad, batch=batch,
            nc_primal=ncp, nc_grad=ncg, grad_remat=grad_remat,
        )
        total_loss = total_loss + lval
        grads = jax.tree_util.tree_map(jnp.add, grads, gp)
    return total_loss, grads


def _train_step_host(
    params, adam_state, ema, base_leaves, view_indices, seeds, seeds_grad,
    refs, lrs, sdf_table=None, *, base_treedef, loss_name,
    cfg_primal: RenderConfig, cfg_grad: RenderConfig, batch: int, specs,
    mask_updates: bool = False, max_lanes: int = 300_000,
    grad_remat: bool = True,
):
    """One optimization step sequenced as host dispatches (see block comment
    above).  DSDF_HOST_MODE picks the granularity: 'view' (default) = one
    jitted ~11-16 s program per view; 'slice' = bench-class ≤max_lanes
    programs (the r4 path — for chips that can't sustain multi-second
    executions).  All intermediate state stays on device; the only
    host↔device sync is the caller's loss fetch."""
    if os.environ.get("DSDF_HOST_MODE", "view") == "slice":
        total_loss, grads = _host_loss_grads(
            params, base_leaves, view_indices, seeds, seeds_grad, refs,
            sdf_table, base_treedef=base_treedef, loss_name=loss_name,
            cfg_primal=cfg_primal, cfg_grad=cfg_grad, batch=batch,
            max_lanes=max_lanes,
        )
    else:
        total_loss, grads = _host_loss_grads_view(
            params, base_leaves, view_indices, seeds, seeds_grad, refs,
            sdf_table, base_treedef=base_treedef, loss_name=loss_name,
            cfg_primal=cfg_primal, cfg_grad=cfg_grad, batch=batch,
            max_lanes=int(os.environ.get("DSDF_HOST_CHUNK_LANES", 600_000)),
            grad_remat=grad_remat,
        )
    return _finish_step_jit(
        params, adam_state, ema, grads, total_loss, lrs,
        specs=specs, mask_updates=mask_updates,
    )


@functools.partial(jax.jit, static_argnames=("loss_name", "cfg_primal", "cfg_grad", "batch", "specs", "base_treedef", "mask_updates", "render_chunks", "mesh", "grad_remat"))
def _train_step(
    params,
    adam_state,
    ema,
    base_leaves,
    view_indices,
    seeds,
    seeds_grad,
    refs,
    lrs,
    sdf_table=None,
    *,
    base_treedef,
    loss_name,
    cfg_primal: RenderConfig,
    cfg_grad: RenderConfig,
    batch: int,
    specs,
    mask_updates: bool = False,
    render_chunks: int = 1,
    mesh=None,
    grad_remat: bool = True,
):
    base = jax.tree_util.tree_unflatten(base_treedef, base_leaves)

    total_loss, grads = _view_batch_loss_grads(
        params, base, view_indices, seeds, seeds_grad, refs, sdf_table,
        loss_name=loss_name, cfg_primal=cfg_primal, cfg_grad=cfg_grad,
        batch=batch, render_chunks=render_chunks, mesh=mesh,
        grad_remat=grad_remat,
    )
    return _finish_step(
        params, adam_state, ema, grads, total_loss, lrs,
        specs=specs, mask_updates=mask_updates,
    )


def load_checkpoint(output_dir: str, iteration, specs):
    """Restore saved parameters (reference opt_configs.py:68-79 +
    util.py:202-216 checkpoint discovery).  ``iteration`` may be an int or
    'final'."""
    import glob

    from ..utils.io import read_vol

    params = {}
    pdir = os.path.join(output_dir, "params")
    for s in specs:
        if isinstance(iteration, int):
            path = os.path.join(pdir, f"{s.key}-data-{iteration:04d}.vol")
        else:
            path = os.path.join(pdir, f"{s.key}-{iteration}.vol")
        if not os.path.exists(path):
            # fall back to the latest ITERATION checkpoint (never silently to
            # the EMA '*-final.vol', which sorts last lexicographically)
            cands = sorted(glob.glob(os.path.join(pdir, f"{s.key}-data-*.vol")))
            if not cands:
                cands = sorted(glob.glob(os.path.join(pdir, f"{s.key}-*.vol")))
            if not cands:
                raise FileNotFoundError(f"no checkpoint for '{s.key}' in {pdir}")
            print(f"[load_checkpoint] '{path}' missing; using '{cands[-1]}'")
            path = cands[-1]
        data = read_vol(path)
        if data.shape[-1] == 1 and s.key == "sdf":
            data = data[..., 0]
        params[s.key] = jnp.asarray(data)
    return params


def optimize_shape(
    scene_name: str,
    opt_cfg: SdfConfig,
    method_cfg: BaseConfig,
    output_dir: str | None = None,
    ref_spp: int = 512,
    scene_dir: str | None = None,
    target_res: int | None = None,
    n_iter: int | None = None,
    verbose: bool = True,
    checkpoint_cb=None,
    resume_from=None,
    write_images: bool = False,
    render_chunks: int = 1,
    mesh=None,
    dispatch: str = "auto",
) -> OptimizationResult:
    """Run a full reconstruction (reference shape_opt.py:32-132 +
    optimize.py: reference rendering happens here from the target SDF).

    ``mesh``: optional ('views','rays') jax.sharding.Mesh — the per-iteration
    view batch is split across view groups and each view's wavefront across
    ray shards (parallel/sharding.py design, applied to the production step).

    ``dispatch``: 'jit' = the one-XLA-dispatch step; 'host' = the host-sliced
    step (:func:`_train_step_host`); 'auto' picks per phase — host when the
    estimated per-step lane work exceeds ``_HOST_DISPATCH_LANES`` (hq/hqq
    final phases, where the one-dispatch program is a ~90 s execution that
    has crashed the v5e worker).  Override with DSDF_DISPATCH=jit/host.
    """
    t_start = time.time()
    n_iter = n_iter if n_iter is not None else method_cfg.n_iter
    specs = tuple(opt_cfg.variables())
    spec_by_key = {s.key: s for s in specs}

    # ---- target scene & reference images at every scheduled resolution ----
    tres = target_res or max(128, opt_cfg.sdf_res)
    rig = scene_rig_full(opt_cfg.scene_name or scene_name, opt_cfg.param_keys)
    bsdf, emitter = rig["bsdf"], rig["emitter"]
    tgt_sdf = GridSDF.create(target_sdf(opt_cfg.scene_name or scene_name, tres, scene_dir))
    cams_full = _make_cameras(opt_cfg, opt_cfg.resx, opt_cfg.resy)
    target_scene = Scene(
        sdf=tgt_sdf, bsdf=bsdf, emitter=emitter, cameras=cams_full,
        mesh=rig["mesh"], area_emitter=rig["area_emitter"],
    )
    ref_cfg = RenderConfig(
        integrator=method_cfg.integrator if method_cfg.integrator != "sdf_prb_reparam" else "sdf_direct_reparam",
        warp=method_cfg.warp_config(),
        trace=method_cfg.trace_params(),
    )
    refs_pyramid = render_reference_images(target_scene, opt_cfg, ref_spp, ref_cfg)

    # ---- initial parameters (or checkpoint restore) ----
    if resume_from is not None:
        assert output_dir, "resume requires an output_dir"
        params = load_checkpoint(output_dir, resume_from, specs)
    else:
        params = {s.key: s.initialize() for s in specs}
    adam_state = adam_init(params)
    ema = {k: params[k] for k in params}
    loss_values = []
    prior_time = 0.0
    if resume_from is not None:
        # Stitch the loss history + wall time across resume segments so the
        # final metadata.json / loss.png cover the WHOLE run like the
        # reference's (python/shape_opt.py:106-119) — VERDICT r4 #4: the
        # 512-run's committed curve covered only the last segment.
        meta_path = os.path.join(output_dir, "metadata.json")
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    prior = json.load(f)
                prev = list(prior.get("loss_values", []))[: resume_from + 1]
                prior_time = float(prior.get("total_time", 0.0))
                # pad to exactly resume_from+1 entries so iteration indices
                # keep lining up even if an older segment predates stitching
                loss_values = prev + [float("nan")] * (resume_from + 1 - len(prev))
            except Exception as e:  # corrupt metadata must not block resume
                print(f"[resume] could not stitch prior metadata: {e}")
                loss_values = [float("nan")] * (resume_from + 1)
        else:
            loss_values = [float("nan")] * (resume_from + 1)
    seed = 0

    from ..ops.warp_conv import ConvWarpConfig

    cfg_grad = RenderConfig(
        integrator=method_cfg.integrator,
        spp=method_cfg.spp,
        warp=method_cfg.warp_config(),
        trace=method_cfg.trace_params(),
        use_warp=method_cfg.warp_kind != "dummy",
        warp_kind=method_cfg.warp_kind,
        conv=ConvWarpConfig(
            n_aux_rays=method_cfg.n_aux_rays,
            kappa=method_cfg.conv_kappa,
            power=method_cfg.conv_power,
        ),
    )
    cfg_primal = dataclasses.replace(
        cfg_grad,
        spp=method_cfg.spp * method_cfg.primal_spp_mult,
    )

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

    start_iter = (resume_from + 1) if isinstance(resume_from, int) else 0
    try:
        for i in range(start_iter, n_iter):
            # --- phase bookkeeping: film res + grid upsampling (outside jit) ---
            res = opt_cfg.res_at(i)
            cams = _make_cameras(opt_cfg, res[0], res[1])
            base = Scene(
                sdf=GridSDF.create(jnp.zeros_like(params["sdf"])), bsdf=bsdf, emitter=emitter, cameras=cams,
                mesh=rig["mesh"], area_emitter=rig["area_emitter"],
            )
            for s in specs:
                if s.upsample_iter and i in s.upsample_iter:
                    up = upsample_sdf if isinstance(s, SdfVariableSpec) else upsample_volume
                    params[s.key] = up(params[s.key])
                    # Adam state (incl. the per-key step counter t) resets on
                    # shape change — mi.ad.Adam behavior
                    sub = adam_init({s.key: params[s.key]})
                    adam_state["m"][s.key] = sub["m"][s.key]
                    adam_state["v"][s.key] = sub["v"][s.key]
                    adam_state["t"][s.key] = sub["t"][s.key]
                    params[s.key] = s.validate(params[s.key], -1)
                    # keep the EMA shape in sync here (the in-jit shape-reset
                    # branch would do it anyway, but at the cost of an extra
                    # XLA specialization for the mixed-shape combination)
                    ema[s.key] = params[s.key]

            view_indices = jnp.asarray(opt_cfg.sensor_indices(i), jnp.int32)
            batch = len(view_indices)
            seeds = []
            seeds_grad = []
            for _ in range(batch):
                seeds.append(seed)
                seeds_grad.append(seed + 1 + opt_cfg.n_sensors)
                seed += 1 + opt_cfg.n_sensors
            refs = refs_pyramid[res][view_indices]

            lrs = {}
            for s in specs:
                if isinstance(s, SdfVariableSpec):
                    lrs[s.key] = s.lr_for(method_cfg.learning_rate, i, params[s.key].shape[0])
                else:
                    lrs[s.key] = s.lr_for(method_cfg.learning_rate, i)

            base_leaves, base_treedef = jax.tree_util.tree_flatten(base)
            # Eager (op-by-op) stencil-table build between steps: the table
            # must track the updated grid, and building it INSIDE the jitted
            # step under the remat scans compile-OOMs at 128³ (69.8 GB of
            # 128×-padded slice operands — see _build_scene).  ~ms per
            # iteration, amortized over a multi-second step.
            _t_tab = time.perf_counter()
            sdf_table = None
            if _attach_tables() and gridops_stencil_ok(params["sdf"]):
                from ..ops import grid as gridops

                z_, y_, x_ = params["sdf"].shape[-3:]
                if (z_ + 3) * (y_ + 3) * (x_ + 3) > gridops._INCREMENTAL_BUILD_ROWS:
                    # 256³-class grids: the traceable builder's transients
                    # RESOURCE_EXHAUST the chip (grid.py) — column-wise
                    # donated build instead (~8 s/iter at 256³)
                    sdf_table = gridops.build_stencil_incremental(params["sdf"])
                else:
                    sdf_table = gridops.build_stencil(params["sdf"])
            _t_tab = time.perf_counter() - _t_tab
            # dispatch choice (per phase: film res changes the estimate)
            b_ = BORDER if cfg_primal.sample_border else 0
            pw_ = (res[0] + 2 * b_) * (res[1] + 2 * b_)
            est_lanes = batch * pw_ * (cfg_primal.spp + 3 * cfg_grad.spp)
            mode = os.environ.get("DSDF_DISPATCH", dispatch)
            use_host = mode == "host" or (
                mode == "auto" and est_lanes > _HOST_DISPATCH_LANES and mesh is None
            )
            if use_host and mesh is not None:
                # _train_step_host has no sharded path — a forced 'host'
                # would silently drop the ('views','rays') sharding
                # (ADVICE r4); only 'auto' guards on mesh is None
                raise ValueError(
                    "dispatch='host' (or DSDF_DISPATCH=host) cannot honor a "
                    "device sharding mesh — use dispatch='jit'/'auto' with "
                    "mesh, or drop the mesh for host-sliced dispatch"
                )
            _t_step = time.perf_counter()
            if use_host:
                params, adam_state, ema, loss = _train_step_host(
                    params, adam_state, ema, tuple(base_leaves), view_indices,
                    jnp.asarray(seeds), jnp.asarray(seeds_grad), refs, lrs,
                    sdf_table, loss_name=opt_cfg.loss, cfg_primal=cfg_primal,
                    cfg_grad=cfg_grad, batch=batch, specs=specs,
                    base_treedef=base_treedef,
                    mask_updates=method_cfg.mask_optimizer,
                    max_lanes=int(os.environ.get("DSDF_HOST_MAX_LANES", 300_000)),
                    grad_remat=_grad_remat_auto(pw_, cfg_grad.spp),
                )
            else:
                params, adam_state, ema, loss = _train_step(
                    params,
                    adam_state,
                    ema,
                    tuple(base_leaves),
                    view_indices,
                    jnp.asarray(seeds),
                    jnp.asarray(seeds_grad),
                    refs,
                    lrs,
                    sdf_table,
                    loss_name=opt_cfg.loss,
                    cfg_primal=cfg_primal,
                    cfg_grad=cfg_grad,
                    batch=batch,
                    specs=specs,
                    base_treedef=base_treedef,
                    mask_updates=method_cfg.mask_optimizer,
                    render_chunks=render_chunks,
                    mesh=mesh,
                    grad_remat=_grad_remat_auto(pw_, cfg_grad.spp),
                )
            _t_step = time.perf_counter() - _t_step
            if os.environ.get("DSDF_TIMING"):
                # host = Python-side enqueue time of the step (includes any
                # blocking puts); drain = device-side completion wait
                _t_f = time.perf_counter()
                _lv = float(loss)
                _t_f = time.perf_counter() - _t_f
                print(f"[timing] iter {i}: table {_t_tab:.2f}s  "
                      f"host {_t_step:.2f}s  drain {_t_f:.2f}s  "
                      f"(host_dispatch={use_host})", flush=True)
            loss_values.append(float(loss))
            if verbose and (i % 8 == 0 or i == n_iter - 1):
                print(f"[{i:4d}] loss = {loss_values[-1]:.5f}  res={res}  sdf={params['sdf'].shape}")

            if output_dir and (i % opt_cfg.checkpoint_frequency == 0 or i == n_iter - 1):
                from ..utils.io import write_vol

                for s in specs:
                    write_vol(os.path.join(output_dir, "params", f"{s.key}-data-{i:04d}.vol"), np.asarray(params[s.key]))
                if write_images:
                    from ..utils.io import write_png

                    cur = _build_scene(base, params)
                    for vi in range(min(opt_cfg.n_sensors, 6)):
                        img = render(cur, seed=i, cfg=dataclasses.replace(cfg_grad, spp=min(cfg_grad.spp, 16)), mode="primal", camera=cams.view(vi))
                        write_png(
                            os.path.join(output_dir, "opt", f"opt-{i:04d}-{vi:02d}.png"),
                            np.asarray(img[..., :3]),
                        )
            if checkpoint_cb is not None:
                checkpoint_cb(i, params, loss_values)

    finally:
        # Always record what we have — the reference's try/finally loss
        # plot + metadata dump (shape_opt.py:73,106-119)
        total_time = prior_time + (time.time() - t_start)  # cumulative across resumes
        if output_dir:
            from ..utils.io import dump_metadata, write_vol

            for s in specs:
                write_vol(os.path.join(output_dir, "params", f"{s.key}-final.vol"), np.asarray(ema[s.key]))
            dump_metadata(
                method_cfg, opt_cfg, {"total_time": total_time, "loss_values": loss_values},
                os.path.join(output_dir, "metadata.json"),
            )
            _write_loss_plot(loss_values, output_dir)
    final_scene = _build_scene(
        Scene(
            sdf=GridSDF.create(params["sdf"]), bsdf=bsdf, emitter=emitter, cameras=cams_full,
            mesh=rig["mesh"], area_emitter=rig["area_emitter"],
        ), params
    )
    return OptimizationResult(params, ema, loss_values, total_time, final_scene)
