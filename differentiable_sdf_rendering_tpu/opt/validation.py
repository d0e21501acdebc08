"""Gradient-validation harness: forward-mode and finite-difference gradient
images w.r.t. the SDF translation ``sdf.p``.

Port of the reference's correctness oracle ``eval_forward_gradient``
(``/root/reference/figures/result_utils.py:126-161``): the gradient image
∂(render)/∂p_axis computed either by forward-mode AD through the
reparameterized renderer (``jax.jvp``) or by central finite differences of
the primal renderer (ε=1e-3, high spp) — the comparison behind the paper's
Figures 4/7/8/15 and our pytest oracles.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from ..models.integrator import RenderConfig, render

__all__ = ["eval_forward_gradient"]


def eval_forward_gradient(
    scene,
    cfg: RenderConfig,
    axis: int = 0,
    view_idx: int = 0,
    seed: int = 0,
    method: str = "ad",
    fd_eps: float = 1e-3,
    fd_spp: int = 2048,
):
    """Gradient image w.r.t. ``sdf.p[axis]`` → (image (H,W,3), grad (H,W,3), stats).

    ``method='ad'``: jvp through the grad-mode render (result_utils.py:151-155).
    ``method='fd'``: two primal renders at ±ε (result_utils.py:143-149).
    """
    t0 = time.time()
    p0 = scene.sdf.p

    if method == "fd":
        cfg_fd = dataclasses.replace(cfg, spp=fd_spp)
        dp = jnp.zeros(3).at[axis].set(fd_eps)

        def primal(p):
            return render(
                scene.replace(sdf=scene.sdf.replace(p=p)), view_idx, seed=seed,
                cfg=cfg_fd, mode="primal",
            )[..., :3]

        img_p = primal(p0 + dp)
        img_m = primal(p0 - dp)
        grad = (img_p - img_m) / (2 * fd_eps)
        img = 0.5 * (img_p + img_m)
    else:
        def rfun(p):
            return render(
                scene.replace(sdf=scene.sdf.replace(p=p)), view_idx, seed=seed,
                cfg=cfg, mode="grad",
            )[..., :3]

        tangent = jnp.zeros(3).at[axis].set(1.0)
        img, grad = jax.jvp(rfun, (p0,), (tangent,))

    jax.block_until_ready(grad)
    stats = {"total_time": time.time() - t0, "method": method, "axis": axis}
    return img, grad, stats
