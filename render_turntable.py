#!/usr/bin/env python3
"""Re-render a finished optimization's checkpoint as a turntable video.

CLI port of ``/root/reference/python/render_turntable.py``:

    python render_turntable.py <scene> --optconfig no-tex-12 --config warp
                               [--outputdir output] [--resx 512] [--spp 256]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene")
    ap.add_argument("--optconfig", default="no-tex-12")
    ap.add_argument("--config", default="warp")
    ap.add_argument("--outputdir", default="output")
    ap.add_argument("--resx", type=int, default=512)
    ap.add_argument("--resy", type=int, default=512)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--n_frames", type=int, default=64)
    ap.add_argument("--iteration", default="final")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu()

    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig
    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import load_checkpoint
    from differentiable_sdf_rendering_tpu.utils.video import render_turntable

    opt_cfg, _ = get_opt_config(args.optconfig)
    run_dir = os.path.join(args.outputdir, args.scene, args.optconfig, args.config)
    it = args.iteration
    if it not in ("final",):
        it = int(it)
    specs = opt_cfg.variables()
    params = load_checkpoint(run_dir, it, specs)
    bsdf, emitter = scene_rig(args.scene, opt_cfg.param_keys)
    scene = Scene.create(params["sdf"], bsdf=bsdf, emitter=emitter, cameras=regular_cameras(1))
    render_turntable(
        scene, run_dir, resx=args.resx, resy=args.resy, spp=args.spp,
        n_frames=args.n_frames, n_chunks=max(1, (args.resx * args.resy * args.spp) // (1 << 21)),
    )
    print(f"[done] turntable → {os.path.join(run_dir, 'turntable')}")


if __name__ == "__main__":
    sys.exit(main())
