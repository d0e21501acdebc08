"""Batched multi-scene optimization: N reconstructions in one program.

The BASELINE.json "multi-scene batch × views" configuration.  The reference
can only fan out optimizations across processes by hand (README:115); here
the *entire train step is vmapped over a scene axis* — one XLA program
advances N reconstructions simultaneously, which keeps the chip full at the
small film resolutions where a single scene under-utilizes it, and composes
with the ('views','rays') mesh for pod-scale runs (scenes × views across
'views', rays within).

Restrictions vs :func:`opt.shape_opt.optimize_shape`: all scenes share one
opt-config (same grid/film schedule); upsampling applies to all scenes at
the same iterations (shapes must match across the batch — that is what
makes the vmap possible).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import regular_cameras
from ..models.integrator import RenderConfig, render
from ..models.scene import Scene
from ..models.scenes_zoo import scene_rig, target_sdf
from ..ops.initializers import upsample_sdf
from ..ops.sdf import GridSDF
from . import losses as losses_mod
from .adam import adam_init, adam_step
from .configs import BaseConfig
from .opt_configs import SdfConfig
from .regularizations import discrete_laplacian_reg
from .variables import SdfVariableSpec

__all__ = ["optimize_shapes_batched"]


def optimize_shapes_batched(
    scene_names: list,
    opt_cfg: SdfConfig,
    method_cfg: BaseConfig,
    n_iter: int = 32,
    ref_spp: int = 128,
    target_res: int = 64,
    verbose: bool = True,
):
    """Jointly reconstruct ``len(scene_names)`` shapes. Returns
    ``{name: (sdf_grid, loss_curve)}``."""
    n_scenes = len(scene_names)
    spec = SdfVariableSpec(
        resolution=opt_cfg.sdf_res,
        upsample_iter=tuple(opt_cfg.upsample_iter or ()),
        regularizer_weight=opt_cfg.sdf_regularizer_weight,
    )
    cams = regular_cameras(opt_cfg.n_sensors, opt_cfg.angle_shift, opt_cfg.resx, opt_cfg.resy)
    bsdf, emitter = scene_rig(scene_names[0], opt_cfg.param_keys)

    cfg_grad = RenderConfig(
        integrator=method_cfg.integrator,
        spp=method_cfg.spp,
        warp=method_cfg.warp_config(),
        trace=method_cfg.trace_params(),
    )
    cfg_primal = dataclasses.replace(cfg_grad, spp=method_cfg.spp * method_cfg.primal_spp_mult)
    ref_cfg = dataclasses.replace(cfg_grad, spp=ref_spp)

    # references for each scene × view (stacked: (S, V, H, W, 3))
    rfun = jax.jit(lambda sc, cam, seed: render(sc, seed=seed, cfg=ref_cfg, mode="primal", camera=cam)[..., :3])
    refs = []
    for name in scene_names:
        tgt = Scene(sdf=GridSDF.create(target_sdf(name, target_res)), bsdf=bsdf, emitter=emitter, cameras=cams)
        refs.append(jnp.stack([rfun(tgt, cams.view(v), v + 41) for v in range(opt_cfg.n_sensors)]))
    refs = jnp.stack(refs)

    params = jnp.stack([spec.initialize() for _ in range(n_scenes)])
    adam_state = adam_init({"sdf": params})
    loss_fn = losses_mod.multiscale_l1 if opt_cfg.loss == "multiscale_l1" else losses_mod.l1

    @functools.partial(jax.jit, static_argnames=("batch",))
    def step(params, adam_state, view_indices, seeds, seeds_grad, refs, lr, *, batch):
        def per_scene(sdf_data, my_refs, seeds, seeds_grad):
            scene = Scene(sdf=GridSDF.create(jnp.zeros_like(sdf_data)), bsdf=bsdf, emitter=emitter, cameras=cams)

            def one_view(j):
                cam = cams.view(view_indices[j])
                sc_det = scene.replace(sdf=scene.sdf.with_data(jax.lax.stop_gradient(sdf_data)))
                img_p = render(sc_det, seed=seeds[j], cfg=cfg_primal, mode="primal", camera=cam)[..., :3]
                lval, dimg = jax.value_and_grad(lambda im: loss_fn(im, my_refs[view_indices[j]]) / batch)(img_p)

                def rfun2(d):
                    return render(scene.replace(sdf=scene.sdf.with_data(d)), seed=seeds_grad[j], cfg=cfg_grad, mode="grad", camera=cam)[..., :3]

                _, vjp = jax.vjp(rfun2, sdf_data)
                (g,) = vjp(dimg)
                return lval, g

            loss = jnp.zeros(())
            grad = jnp.zeros_like(sdf_data)
            for j in range(batch):
                l, g = one_view(j)
                loss, grad = loss + l, grad + g
            rv, rg = jax.value_and_grad(lambda s: spec.regularizer_weight * discrete_laplacian_reg(s))(sdf_data)
            return loss + rv, spec.validate_gradient(grad + rg)

        losses, grads = jax.vmap(per_scene)(params, refs, seeds, seeds_grad)
        new_p, new_state = adam_step({"sdf": params}, {"sdf": grads}, adam_state, {"sdf": lr})
        validated = jax.vmap(lambda d: spec.validate(d, -1))(new_p["sdf"])
        return validated, new_state, losses

    seed = 0
    loss_curves = [[] for _ in range(n_scenes)]
    for i in range(n_iter):
        if spec.upsample_iter and i in spec.upsample_iter:
            params = jax.vmap(upsample_sdf)(params)
            adam_state = adam_init({"sdf": params})
        vi = jnp.asarray(opt_cfg.sensor_indices(i), jnp.int32)
        batch = len(vi)
        seeds = np.zeros((n_scenes, batch), np.int32)
        seeds_g = np.zeros((n_scenes, batch), np.int32)
        for s in range(n_scenes):
            for j in range(batch):
                seeds[s, j] = seed
                seeds_g[s, j] = seed + 1 + opt_cfg.n_sensors
                seed += 1 + opt_cfg.n_sensors
        lr = spec.lr_for(method_cfg.learning_rate, i, params.shape[1])
        params, adam_state, losses = step(
            params, adam_state, vi, jnp.asarray(seeds), jnp.asarray(seeds_g), refs, lr, batch=batch
        )
        for s in range(n_scenes):
            loss_curves[s].append(float(losses[s]))
        if verbose and i % 8 == 0:
            print(f"[{i:4d}] losses = {[round(float(l), 5) for l in losses]}")

    return {name: (params[s], loss_curves[s]) for s, name in enumerate(scene_names)}
