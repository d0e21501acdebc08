#!/usr/bin/env python3
"""Figure-quality renders from a finished DEVICE training run (VERDICT r3
#9): target vs reconstruction images + the loss curve, built from the run's
checkpoints/metadata rather than re-optimizing.

Usage:
  python scripts/device_figure.py output/device_r4/dragon-no-tex-12-512/warp \
      --scene dragon --optconfig no-tex-12 --out output/figures/device_opt_results
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--optconfig", default="no-tex-12")
    ap.add_argument("--out", default="output/figures/device_opt_results")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu()

    import numpy as np
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_chunked
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full, target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import load_checkpoint
    from differentiable_sdf_rendering_tpu.utils.io import write_png
    from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)
    oc, _ = get_opt_config(args.optconfig)
    rig = scene_rig_full(args.scene, oc.param_keys)
    cams = regular_cameras(oc.n_sensors, oc.angle_shift, args.res, args.res)

    params = load_checkpoint(args.run_dir, "final", tuple(oc.variables()))
    recon_sdf = GridSDF.create(params["sdf"]).prepare()
    tgt_sdf = GridSDF.create(
        target_sdf(args.scene, max(128, oc.sdf_res))
    ).prepare()

    cfg = RenderConfig(integrator="sdf_direct_reparam", spp=args.spp)
    b_lanes = (args.res + 4) ** 2 * args.spp
    n_chunks = next(c for c in range(1, args.spp + 1)
                    if args.spp % c == 0 and b_lanes // c <= 300_000)

    def shot(sdf, vi, seed):
        scene = Scene(sdf=sdf, bsdf=rig["bsdf"], emitter=rig["emitter"],
                      cameras=cams, mesh=rig["mesh"],
                      area_emitter=rig["area_emitter"])
        img = render_chunked(scene, seed=seed, cfg=cfg, mode="primal",
                             camera=cams.view(vi), n_chunks=n_chunks)
        return np.clip(np.asarray(img[..., :3]), 0.0, 1.0)

    meta = {"run_dir": args.run_dir, "res": args.res, "spp": args.spp, "views": {}}
    for vi in range(args.views):
        t = shot(tgt_sdf, vi, 7)
        r = shot(recon_sdf, vi, 7)
        write_png(os.path.join(args.out, f"target_v{vi}.png"), t)
        write_png(os.path.join(args.out, f"recon_v{vi}.png"), r)
        err = float(np.abs(t - r).mean())
        meta["views"][vi] = {"mean_abs_err": round(err, 5)}
        print(f"view {vi}: mean|target-recon| = {err:.5f}", flush=True)

    # loss curve from the run's metadata
    mpath = os.path.join(args.run_dir, "metadata.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            md = json.load(f)
        losses = md.get("stats", {}).get("loss_values") or md.get("loss_values")
        if losses:
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure(figsize=(5, 3))
                plt.semilogy(losses)
                plt.xlabel("iteration")
                plt.ylabel("loss")
                plt.title(f"{args.scene} {args.optconfig} (device)")
                plt.tight_layout()
                plt.savefig(os.path.join(args.out, "loss_curve.png"), dpi=130)
                meta["final_loss"] = losses[-1]
                meta["mean_loss_last16"] = float(np.mean(losses[-16:]))
            except Exception as e:
                print("loss plot skipped:", e)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
