#!/usr/bin/env python3
"""Forward-gradient comparison across methods (reference
``figures/forwardgrads/forwardgrads.py:23-52``): for each gradient method
(ours, conv-N, shading-only) compute the forward-mode gradient image w.r.t.
an ``sdf.p`` translation axis, against the FD reference, with per-method
timings → JSON + PNG grid.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--fd-spp", type=int, default=2048)
    ap.add_argument("--axis", type=int, default=0)
    ap.add_argument("--integrator", default="sdf_direct_reparam")
    ap.add_argument("--n-seeds", type=int, default=4, help="AD gradient images averaged over seeds")
    ap.add_argument("--out", default="output/forwardgrads")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu
        force_cpu()

    import numpy as np

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.warp_conv import ConvWarpConfig
    from differentiable_sdf_rendering_tpu.opt.validation import eval_forward_gradient
    from differentiable_sdf_rendering_tpu.utils.io import write_png

    scene = Scene.create(
        target_sdf(args.scene, args.grid),
        cameras=regular_cameras(2, resx=args.res, resy=args.res),
    )
    methods = {
        "warp": RenderConfig(spp=args.spp, integrator=args.integrator),
        "conv8": RenderConfig(spp=args.spp, integrator=args.integrator,
                              warp_kind="conv", conv=ConvWarpConfig(n_aux_rays=8)),
        "onlyshading": RenderConfig(spp=args.spp, integrator=args.integrator, use_warp=False),
    }

    os.makedirs(args.out, exist_ok=True)
    stats = {}
    grads = {}
    _, grad_fd, st = eval_forward_gradient(
        scene, methods["warp"], axis=args.axis, method="fd", fd_spp=args.fd_spp
    )
    grads["fd"] = np.asarray(grad_fd)
    stats["fd"] = st
    for name, cfg in methods.items():
        acc = None
        for seed in range(args.n_seeds):
            img, grad, st = eval_forward_gradient(scene, cfg, axis=args.axis, method="ad", seed=seed)
            g = np.asarray(grad)
            acc = g if acc is None else acc + g
        grads[name] = acc / args.n_seeds
        stats[name] = st
        print(f"{name:12s} total_time={st['total_time']:.2f}s  |grad|₁={np.abs(grads[name]).mean():.4f}")

    scale = np.percentile(np.abs(grads["fd"]), 99) + 1e-9
    for name, g in grads.items():
        vis = np.clip(g.mean(-1) / (2 * scale) + 0.5, 0, 1)
        rgb = np.stack([vis, 0.5 * np.ones_like(vis), 1.0 - vis], -1)
        write_png(os.path.join(args.out, f"grad-{name}.png"), (rgb * 255).astype(np.uint8))
        if name != "fd":
            a, f = g.ravel(), grads["fd"].ravel()
            denom = np.linalg.norm(a) * np.linalg.norm(f) + 1e-12
            stats[name]["corr_vs_fd"] = float(np.dot(a, f) / denom)
    with open(os.path.join(args.out, "forwardgrads.json"), "wt") as fjson:
        json.dump(stats, fjson, indent=2, default=str)
    print("→", args.out)


if __name__ == "__main__":
    main()
