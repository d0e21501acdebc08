#!/usr/bin/env python3
"""CLI driver for SDF shape reconstruction.

Surface-compatible with the reference's entry point
(``/root/reference/python/optimize.py:63-104``):

    python optimize.py <scene...> --optconfig <name...> [--configs warp ...]
                       [--n_iter N] [--refspp N] [--outputdir DIR] [--key=value ...]

Scenes are procedural target shapes (or .vol assets if present); the two
config axes (method configs × optimization configs) and the generic
``--key=value`` override cascade match the reference UX.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("scenes", nargs="+", help="scene name(s), e.g. dragon")
    parser.add_argument("--optconfig", nargs="+", default=["no-tex-12"], help="optimization config name(s)")
    parser.add_argument("--configs", nargs="+", default=["warp"], help="gradient method config name(s)")
    parser.add_argument("--outputdir", default="output")
    parser.add_argument("--refspp", type=int, default=512, help="reference image spp")
    parser.add_argument("--n_iter", type=int, default=None)
    parser.add_argument("--scenedir", default=None, help="optional directory with real scene assets")
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--print_params", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args, extra = parser.parse_known_args(argv)

    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu()

    from differentiable_sdf_rendering_tpu.opt.configs import get_config, apply_cmdline_args
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    for scene in args.scenes:
        for opt_name in args.optconfig:
            for cfg_name in args.configs:
                method_cfg = get_config(cfg_name)
                rest = apply_cmdline_args(method_cfg, list(extra))
                opt_cfg, rest = get_opt_config(opt_name, rest)
                if rest:
                    print(f"[warn] unconsumed arguments: {rest}")
                if args.print_params:
                    print("method config:", method_cfg)
                    print("opt config:", opt_cfg)
                    continue
                out = os.path.join(args.outputdir, scene, opt_name, method_cfg.name)
                if os.path.exists(os.path.join(out, "metadata.json")) and not args.force:
                    print(f"[skip] {out} exists (use --force)")
                    continue
                print(f"[run] scene={scene} optconfig={opt_name} config={cfg_name} → {out}")
                result = optimize_shape(
                    scene,
                    opt_cfg,
                    method_cfg,
                    output_dir=out,
                    ref_spp=args.refspp,
                    scene_dir=args.scenedir,
                    n_iter=args.n_iter,
                )
                print(f"[done] final loss {result.loss_values[-1]:.5f} in {result.total_time:.1f}s")


if __name__ == "__main__":
    sys.exit(main())
