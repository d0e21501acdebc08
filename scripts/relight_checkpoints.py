#!/usr/bin/env python3
"""Re-light optimization checkpoints under alternative lighting/BSDF rigs.

Port of the reference's studio-relight evaluation
(``figures/result_utils.py:41-123``: checkpoints at iterations
[0, 64, 128, 256, 'final'] re-rendered in a studio rig with
diffuse/principled/plain BSDFs).  The studio scene asset is not shipped;
the rigs here are procedural: a bright sky envmap, a vMF key light, and a
plain headlight — with diffuse / principled / plain-gray BSDFs.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="output/<scene>/<optconfig>/<config> directory")
    ap.add_argument("--iterations", nargs="+", default=["0", "64", "128", "256", "final"])
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu
        force_cpu()

    import numpy as np

    from differentiable_sdf_rendering_tpu.models.bsdf import DiffuseBSDF, PrincipledBSDF
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.emitter import VMFEmitter, make_gradient_envmap
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.utils.io import read_vol, write_png

    rigs = {
        "studio-diffuse": (DiffuseBSDF.create((0.8, 0.78, 0.75)), make_gradient_envmap()),
        "studio-principled": (PrincipledBSDF.create((0.7, 0.72, 0.8), 0.25), make_gradient_envmap()),
        "studio-plain": (
            DiffuseBSDF.create((0.65, 0.65, 0.65)),
            VMFEmitter.create(mu=(0.3, 0.9, -0.2), scale=(10.0,) * 3, ambient=(0.25,) * 3, kappa=8.0),
        ),
    }
    cams = regular_cameras(1, resx=args.res, resy=args.res)
    out_dir = os.path.join(args.run_dir, "relight")
    os.makedirs(out_dir, exist_ok=True)

    for it in args.iterations:
        if it == "final":
            path = os.path.join(args.run_dir, "params", "sdf-final.vol")
        else:
            path = os.path.join(args.run_dir, "params", f"sdf-data-{int(it):04d}.vol")
        if not os.path.exists(path):
            cands = sorted(glob.glob(os.path.join(args.run_dir, "params", "sdf-*.vol")))
            if not cands:
                print(f"[skip] no checkpoints in {args.run_dir}")
                return
            path = cands[-1]
        data = read_vol(path)[..., 0]
        for rig_name, (bsdf, emitter) in rigs.items():
            scene = Scene.create(data, bsdf=bsdf, emitter=emitter, cameras=cams)
            img = render(scene, 0, seed=0, cfg=RenderConfig(spp=args.spp))
            write_png(os.path.join(out_dir, f"{rig_name}-{it}.png"), np.asarray(img[..., :3]))
            print(f"relit {it} under {rig_name}")
    print("→", out_dir)


if __name__ == "__main__":
    main()
