#!/usr/bin/env python3
"""Figure-9 benchmark harness: per-method render cost + redistancing scaling.

Port of ``/root/reference/figures/benchmark/benchmark.py``:
  * Fig 9a — primal+adjoint render wall-clock for {OnlyShading, Warp (ours),
    Conv-2/4/8/16/32} at 256² px, 256 primal / 64 adjoint spp, on the
    bunny/logo/shadowing-analog SDFs (mean of 5).
  * Fig 9b — redistancing time at 16³…512³ (mean of 5).

Writes JSON results + a bar-chart PNG.  Scale down with --scale small for a
quick local run.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "medium", "full"], default="small")
    ap.add_argument("--out", default="output/benchmark")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import target_sdf
    from differentiable_sdf_rendering_tpu.ops.redistance import redistance
    from differentiable_sdf_rendering_tpu.ops.warp_conv import ConvWarpConfig
    from differentiable_sdf_rendering_tpu.utils.profiling import device_time

    if args.scale == "full":
        res, pspp, aspp, grid, runs = 256, 256, 64, 128, 5
        conv_sizes = [2, 4, 8, 16, 32]
        redist_sizes = [16, 32, 64, 128, 256, 512]
        scenes = ["bunny", "cubes", "torus"]
    elif args.scale == "medium":
        # device-safe: every program is a ≤~300 k-lane strided slice (the
        # class proven safe on the v5e; single full renders crash it)
        res, pspp, aspp, grid, runs = 128, 64, 16, 64, 2
        conv_sizes = [2, 4, 8, 16, 32]
        redist_sizes = [16, 32, 64, 128, 256]
        scenes = ["bunny"]
    else:
        res, pspp, aspp, grid, runs = 48, 16, 8, 32, 2
        conv_sizes = [2, 8]
        redist_sizes = [16, 32, 64]
        scenes = ["bunny"]

    methods = {"onlyshading": RenderConfig(spp=aspp, use_warp=False),
               "warp": RenderConfig(spp=aspp)}
    for n_aux in conv_sizes:
        methods[f"conv{n_aux}"] = RenderConfig(
            spp=aspp, warp_kind="conv", conv=ConvWarpConfig(n_aux_rays=n_aux)
        )

    os.makedirs(args.out, exist_ok=True)
    results = {"render": {}, "redistance": {}}

    for scene_name in scenes:
        sdf = target_sdf(scene_name, grid)
        scene = Scene.create(sdf, cameras=regular_cameras(1, resx=res, resy=res))
        results["render"][scene_name] = {}
        if args.scale == "medium":
            # host-sliced protocol (bench.py pattern): spp-strided slices,
            # per-slice VJP, one fetch per timed pass — each program stays
            # in the ≤~300 k-lane class the v5e tolerates
            from differentiable_sdf_rendering_tpu.models.integrator import render_lane_block
            from differentiable_sdf_rendering_tpu.ops.film import BORDER

            cam = scene.cameras.view(0)
            scene = scene.replace(sdf=scene.sdf.prepare())
            b = BORDER
            pw = (res + 2 * b) * (res + 2 * b)
            k = 4  # spp-slots per slice

            for name, cfg in methods.items():
                cfg_p = dataclasses.replace(cfg, spp=pspp)
                i_p = jnp.arange(pw * k, dtype=jnp.uint32)
                base_p = (i_p // k) * jnp.uint32(pspp) + (i_p % k)
                i_a = jnp.arange(pw * k, dtype=jnp.uint32)
                base_a = (i_a // k) * jnp.uint32(cfg.spp) + (i_a % k)
                goal = jnp.ones((res + 2 * b, res + 2 * b, 5), jnp.float32)

                @jax.jit
                def pslice(scene, c, cfg_p=cfg_p, base_p=base_p):
                    lane = base_p + c * jnp.uint32(k)
                    return render_lane_block(scene, cam, lane, 0, cfg_p,
                                             "primal", dense_groups=k).sum()

                @jax.jit
                def aslice(scene, goal, c, cfg=cfg, base_a=base_a):
                    lane = base_a + c * jnp.uint32(k)

                    def rf(data):
                        from differentiable_sdf_rendering_tpu.ops import grid as gridops

                        st = scene.sdf.stencil
                        sdf2 = scene.sdf.replace(
                            data=data,
                            stencil=None if st is None else gridops.attach_stencil(data, st),
                        )
                        return render_lane_block(scene.replace(sdf=sdf2), cam,
                                                 lane, 1, cfg, "grad", dense_groups=k)

                    _, vjp = jax.vjp(rf, scene.sdf.data)
                    (g,) = vjp(goal)
                    return g.sum()

                def pass_once(scene):
                    acc = 0.0
                    for c in range(pspp // k):
                        acc = acc + pslice(scene, jnp.uint32(c))
                    for c in range(cfg.spp // k):
                        acc = acc + aslice(scene, goal, jnp.uint32(c))
                    return acc

                dt, _ = device_time(pass_once, scene, n_runs=runs)
                results["render"][scene_name][name] = dt
                print(f"[9a] {scene_name:8s} {name:12s} {dt*1e3:8.1f} ms", flush=True)
            continue
        for name, cfg in methods.items():
            cfg_p = dataclasses.replace(cfg, spp=pspp)

            def step(scene):
                img = render(scene, 0, seed=0, cfg=cfg_p, mode="primal")

                def rf(data):
                    return render(
                        scene.replace(sdf=scene.sdf.replace(data=data)),
                        0, seed=1, cfg=cfg, mode="grad",
                    )[..., :3]

                _, vjp = jax.vjp(rf, scene.sdf.data)
                (g,) = vjp(jnp.ones((res, res, 3)))
                return img.sum() + g.sum()

            jstep = jax.jit(step)
            dt, _ = device_time(jstep, scene, n_runs=runs)
            results["render"][scene_name][name] = dt
            print(f"[9a] {scene_name:8s} {name:12s} {dt*1e3:8.1f} ms")

    for r in redist_sizes:
        phi = target_sdf("bunny", min(r, 128)) * 3.0
        if r > 128:
            from differentiable_sdf_rendering_tpu.ops.initializers import upsample_sdf

            while phi.shape[0] < r:
                phi = upsample_sdf(phi)
        jr = jax.jit(lambda x: redistance(x))
        dt, _ = device_time(jr, phi, n_runs=runs)
        results["redistance"][r] = dt
        print(f"[9b] redistance {r:4d}^3 {dt*1e3:8.1f} ms")

    with open(os.path.join(args.out, "benchmark.json"), "wt") as f:
        json.dump(results, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        scene0 = scenes[0]
        names = list(results["render"][scene0])
        vals = [results["render"][scene0][n] for n in names]
        axes[0].bar(names, vals)
        axes[0].set_ylabel("primal+adjoint time [s]")
        axes[0].set_title(f"Rendering time, {res}² px ({pspp}+{aspp} spp)")
        axes[0].tick_params(axis="x", rotation=45)
        rs = sorted(results["redistance"])
        axes[1].plot(rs, [results["redistance"][r] for r in rs], "o-")
        axes[1].set_xscale("log", base=2)
        axes[1].set_yscale("log")
        axes[1].set_xlabel("resolution")
        axes[1].set_ylabel("redistancing time [s]")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "benchmark.png"), dpi=120)
    except Exception as e:  # plotting is best-effort
        print("plotting skipped:", e)
    print("results →", os.path.join(args.out, "benchmark.json"))


if __name__ == "__main__":
    main()
