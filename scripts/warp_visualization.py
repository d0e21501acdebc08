#!/usr/bin/env python3
"""Warp-field visualization (reference ``figures/sphere_reparam``):
renders the warp vector field and divergence around a shape's silhouette as
images — V magnitude, (vx, vy) arrows coded as color, div — for a pixel
grid of rays from one camera.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sphere")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--out", default="output/warp_vis")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_aovs
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.trace import sphere_trace_warp
    from differentiable_sdf_rendering_tpu.ops.warp import WarpConfig, warp_eval, warp_vector_and_jac
    from differentiable_sdf_rendering_tpu.utils.io import write_png

    scene = Scene.create(
        target_sdf(args.scene, args.grid),
        cameras=regular_cameras(1, resx=args.res, resy=args.res),
    )
    cam = scene.cameras.view(0)
    cfg = RenderConfig(spp=1)
    aovs = render_aovs(scene, 0, seed=0, cfg=cfg)

    # the warp vector itself at the warp points (per center-ray)
    H = W = args.res
    ys, xs = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5, indexing="ij")
    pos = jnp.stack([xs.ravel(), ys.ravel()], -1)
    o, d = cam.sample_ray(pos)
    res_t = sphere_trace_warp(scene.sdf, o, d)
    x = o + jnp.where(jnp.isfinite(res_t.warp_t), res_t.warp_t, 1.0)[..., None] * d
    v0, _, f, _ = warp_vector_and_jac(scene.sdf, x, WarpConfig())
    vimg = np.asarray(v0).reshape(H, W, 3)
    vmag = np.linalg.norm(vimg, axis=-1)

    os.makedirs(args.out, exist_ok=True)

    def norm01(a, pct=98):
        s = np.percentile(np.abs(a), pct) + 1e-9
        return np.clip(a / (2 * s) + 0.5, 0, 1)

    write_png(os.path.join(args.out, "warp_xy.png"),
              np.stack([norm01(vimg[..., 0]), norm01(vimg[..., 1]), 0.5 * np.ones_like(vmag)], -1))
    write_png(os.path.join(args.out, "warp_mag.png"), np.repeat((vmag / (vmag.max() + 1e-9))[..., None], 3, -1))
    write_png(os.path.join(args.out, "div.png"), np.repeat(norm01(np.asarray(aovs["div"]))[..., None], 3, -1))
    write_png(os.path.join(args.out, "weight_sum.png"),
              np.repeat(np.clip(np.asarray(aovs["weight_sum"]), 0, 1)[..., None], 3, -1))
    write_png(os.path.join(args.out, "steps.png"),
              np.repeat((np.asarray(aovs["i"]) / max(1.0, float(np.asarray(aovs["i"]).max())))[..., None], 3, -1))
    print("→", args.out)


if __name__ == "__main__":
    main()
