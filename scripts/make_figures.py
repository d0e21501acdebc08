#!/usr/bin/env python3
"""Regenerate the reference paper's figure suite (TPU-native analog).

The reference drives its 13 figure directories through
``figures/run_all_figures.py:10-24``; this is the equivalent driver for this
framework.  Each figure is a function writing PNG/PDF + JSON into
``output/figures/<name>/``; existing standalone scripts (benchmark,
forwardgrads, warp visualization) are invoked where they already cover a
figure.  ``--scale small`` (default) produces smoke-scale versions that run
on CPU in minutes; ``--scale full`` mirrors the paper's resolutions.

Figure map (reference driver -> here):
  benchmark         figures/benchmark/benchmark.py      -> scripts/benchmark_methods.py
  forwardgrads      figures/forwardgrads/forwardgrads.py-> scripts/forwardgrads.py
  sphere_reparam    figures/sphere_reparam/...          -> scripts/warp_visualization.py
  opt_results       figures/opt_results/opt_results.py  -> fig_opt_results (multi-scene recon grid)
  conv_opt_results  figures/conv_opt_results/...        -> fig_conv_opt_results (ours vs conv-N losses)
  shading_gradients figures/shading_gradients/...       -> fig_shading_gradients (warp vs shading-only grads)
  normalization     figures/normalization/...           -> fig_normalization (normalized vs not)
  nested_reparam    figures/nested_reparam/...          -> fig_nested_reparam (mirror scene grads via PRB)
  indirect_reparam  figures/indirect_reparam/...        -> fig_indirect_reparam (primary-only vs full reparam opt)
  limitations       figures/limitations/limitations.py  -> fig_limitations (complex thin geometry, lego)
  sdf (2-D)         figures/sdf/ + disk_tracing.py      -> fig_sdf2d (weighted 2-D trace spec)
  teaser            figures/teaser/teaser.py            -> fig_teaser (turntable of an optimized shape)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Wong (2011) colorblind-safe palette, fixed assignment order per method —
# identity never comes from a matplotlib cycle.
METHOD_COLORS = {
    "warp": "#0072B2",
    "warpprb": "#0072B2",
    "conv2": "#E69F00",
    "conv4": "#D55E00",
    "conv8": "#CC79A7",
    "conv": "#56B4E9",
    "onlyshadinggrad": "#009E73",
    "fd": "#555555",
}


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _outdir(base, name):
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    return d


def _save_image_grid(path, rows, row_titles, col_titles, diverging=False):
    """Image grid; diverging=True renders signed data on a symmetric
    two-hue map with a neutral midpoint (gradient images)."""
    import numpy as np

    plt = _mpl()
    nr, nc = len(rows), max(len(r) for r in rows)
    fig, axes = plt.subplots(nr, nc, figsize=(2.4 * nc, 2.5 * nr), squeeze=False)
    for i, row in enumerate(rows):
        for j, img in enumerate(row):
            ax = axes[i][j]
            img = np.asarray(img)
            if diverging and img.ndim == 2:
                lim = max(1e-12, float(np.percentile(np.abs(img), 99.5)))
                ax.imshow(img, cmap="RdBu_r", vmin=-lim, vmax=lim)
            else:
                ax.imshow(np.clip(img, 0.0, 1.0))
            ax.set_xticks([])
            ax.set_yticks([])
            if i == 0 and j < len(col_titles):
                ax.set_title(col_titles[j], fontsize=9)
            if j == 0 and i < len(row_titles):
                ax.set_ylabel(row_titles[i], fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)


def _loss_plot(path, curves, title):
    """curves: list of (label, color, values)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5.0, 3.4))
    for label, color, vals in curves:
        ax.plot(range(len(vals)), vals, color=color, lw=2.0, label=label)
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("image loss")
    ax.set_title(title, fontsize=10)
    ax.grid(True, alpha=0.25, lw=0.5)
    if len(curves) > 1:
        ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    fig.savefig(path.rsplit(".", 1)[0] + ".pdf")
    plt = None


def _smoke_opt(scene, method="warp", n_iter=24, res=48, n_views=6, sdf_res=16,
               upsample=(12,), out_dir=None, opt_name="no-tex-12"):
    """One small-scale reconstruction; returns (result, target_scene images)."""
    import dataclasses

    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    opt_cfg, _ = get_opt_config(opt_name, [
        f"--resx={res}", f"--resy={res}", f"--n_sensors={n_views}",
        f"--batch_size={min(3, n_views)}",
    ])
    opt_cfg = dataclasses.replace(opt_cfg, sdf_res=sdf_res,
                                  upsample_iter=tuple(upsample))
    m = get_config(method)
    m = dataclasses.replace(m, spp=8, primal_spp_mult=2, n_iter=n_iter)
    return optimize_shape(
        scene, opt_cfg, m, output_dir=out_dir, ref_spp=64,
        target_res=max(64, 2 * sdf_res), n_iter=n_iter, verbose=False,
    )


def _render_final(result, view=0, spp=48):
    """Final (EMA-params) render of a finished optimization."""
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render

    scene = result.scene
    final = render(scene, view, seed=7, cfg=RenderConfig(spp=spp), mode="primal")
    return jnp.clip(final[..., :3], 0, 1)


def fig_opt_results(base, scale):
    """Main quality figure (reference opt_results.py:21-51): per-scene
    target vs reconstruction + loss curve."""
    out = _outdir(base, "opt_results")
    scenes = ["dragon", "bunny", "chair"] if scale == "small" else [
        "dragon", "bunny", "chair", "cubes", "torus"]
    n_iter = 24 if scale == "small" else 128
    res = 48 if scale == "small" else 128
    rows, row_titles, meta = [], [], {}
    curves = []
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig, target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF

    import jax.numpy as jnp

    for i, sc in enumerate(scenes):
        t0 = time.time()
        result = _smoke_opt(sc, n_iter=n_iter, res=res, out_dir=os.path.join(out, sc))
        recon = _render_final(result)
        bsdf, emitter = scene_rig(sc)
        tgt = Scene(
            sdf=GridSDF.create(target_sdf(sc, 64)), bsdf=bsdf, emitter=emitter,
            cameras=result.scene.cameras, mesh=None, area_emitter=None,
        )
        timg = jnp.clip(render(tgt, 0, seed=7, cfg=RenderConfig(spp=48))[..., :3], 0, 1)
        rows.append([timg, recon])
        row_titles.append(sc)
        curves.append((sc, list(METHOD_COLORS.values())[i % len(METHOD_COLORS)],
                       [float(v) for v in result.loss_values]))
        meta[sc] = {"final_loss": float(result.loss_values[-1]),
                    "first_loss": float(result.loss_values[0]),
                    "time_s": round(time.time() - t0, 1)}
    _save_image_grid(os.path.join(out, "opt_results.png"), rows, row_titles,
                     ["target", "reconstruction"])
    _loss_plot(os.path.join(out, "losses.png"),
               [(s, c, v) for (s, c, v) in curves], "reconstruction losses")
    json.dump(meta, open(os.path.join(out, "meta.json"), "w"), indent=1)
    print(f"[opt_results] {meta}")


def fig_conv_opt_results(base, scale):
    """Ours vs the convolution baseline on one scene (reference
    conv_opt_results): loss curves per method."""
    out = _outdir(base, "conv_opt_results")
    methods = ["warp", "conv2", "conv8"] if scale == "small" else [
        "warp", "conv2", "conv4", "conv8", "conv"]
    n_iter = 20 if scale == "small" else 96
    curves, meta = [], {}
    from differentiable_sdf_rendering_tpu.opt.configs import get_config

    for m in methods:
        t0 = time.time()
        r = _smoke_opt("dragon", method=m, n_iter=n_iter,
                       out_dir=os.path.join(out, m))
        curves.append((get_config(m).pretty_name + f" [{m}]", METHOD_COLORS[m],
                       [float(v) for v in r.loss_values]))
        meta[m] = {"final_loss": float(r.loss_values[-1]),
                   "time_s": round(time.time() - t0, 1)}
    _loss_plot(os.path.join(out, "conv_opt_losses.png"), curves,
               "ours vs convolution baseline (dragon)")
    json.dump(meta, open(os.path.join(out, "meta.json"), "w"), indent=1)
    print(f"[conv_opt_results] {meta}")


def _grad_image(scene_name, method, res, spp, axis=0, grid=32):
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig, target_sdf
    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.validation import eval_forward_gradient
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF

    bsdf, emitter = scene_rig(scene_name)
    scene = Scene(
        sdf=GridSDF.create(target_sdf(scene_name, grid)), bsdf=bsdf,
        emitter=emitter, cameras=regular_cameras(1, resx=res, resy=res),
        mesh=None, area_emitter=None,
    )
    mc = get_config(method)
    cfg = RenderConfig(integrator=mc.integrator, warp=mc.warp_config(),
                       trace=mc.trace_params(), spp=spp)
    if mc.use_finite_differences:
        img, grad, _ = eval_forward_gradient(scene, cfg, axis=axis, method="fd",
                                             fd_spp=max(4 * spp, 256))
    else:
        img, grad, _ = eval_forward_gradient(scene, cfg, axis=axis, method="ad")
    return jnp.clip(img, 0, 1), jnp.mean(grad, axis=-1)


def fig_shading_gradients(base, scale):
    """Gradient images with/without silhouette (warp) gradients (reference
    shading_gradients): ours vs shading-only vs FD."""
    out = _outdir(base, "shading_gradients")
    res = 48 if scale == "small" else 128
    spp = 24 if scale == "small" else 128
    rows, col_titles = [], ["primal", "ours", "shading-only", "FD"]
    imgs, grads = {}, {}
    for m in ("warp", "onlyshadinggrad", "fd"):
        imgs[m], grads[m] = _grad_image("dragon", m, res, spp)
    rows.append([imgs["warp"], grads["warp"], grads["onlyshadinggrad"], grads["fd"]])
    _save_image_grid(os.path.join(out, "shading_gradients.png"), rows, ["dragon"],
                     col_titles, diverging=True)
    print(f"[shading_gradients] -> {out}")


def fig_normalization(base, scale):
    """Warp-field normalization ablation (reference normalization figure):
    normalized vs non-normalized gradient images vs FD."""
    out = _outdir(base, "normalization")
    res = 48 if scale == "small" else 128
    spp = 24 if scale == "small" else 128
    imgs, grads = {}, {}
    for m in ("warp", "warpnotnormalized", "fd"):
        imgs[m], grads[m] = _grad_image("sphere", m, res, spp)
    _save_image_grid(
        os.path.join(out, "normalization.png"),
        [[imgs["warp"], grads["warp"], grads["warpnotnormalized"], grads["fd"]]],
        ["sphere"], ["primal", "normalized (ours)", "not normalized", "FD"],
        diverging=True,
    )
    print(f"[normalization] -> {out}")


def fig_nested_reparam(base, scale):
    """Gradients through a mirror reflection (reference nested_reparam /
    indirect_reparam): PRB primal render of the mirror-opt scene + the
    forward gradient image w.r.t. the SDF translation, which is nonzero in
    the REFLECTED silhouette only through nested reparameterization."""
    out = _outdir(base, "nested_reparam")
    res = 48 if scale == "small" else 128
    spp = 16 if scale == "small" else 96

    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig_full, target_sdf
    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.validation import eval_forward_gradient
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF

    rig = scene_rig_full("mirror-opt")
    scene = Scene(
        sdf=GridSDF.create(target_sdf("mirror-opt", 32 if scale == "small" else 64)),
        bsdf=rig["bsdf"], emitter=rig["emitter"],
        cameras=regular_cameras(1, resx=res, resy=res),
        mesh=rig["mesh"], area_emitter=rig["area_emitter"],
    )
    mc = get_config("warpprb")
    cfg = RenderConfig(integrator=mc.integrator, warp=mc.warp_config(),
                       trace=mc.trace_params(), spp=spp, max_depth=3)
    img, grad, stats = eval_forward_gradient(scene, cfg, axis=0, method="ad")
    _save_image_grid(
        os.path.join(out, "nested_reparam.png"),
        [[jnp.clip(img, 0, 1), jnp.mean(grad, axis=-1)]],
        ["mirror-opt"], ["PRB primal (direct + reflection)", "d/dp_x (nested reparam)"],
        diverging=True,
    )
    json.dump({"grad_abs_mean": float(jnp.mean(jnp.abs(grad)))},
              open(os.path.join(out, "meta.json"), "w"))
    print(f"[nested_reparam] grad_abs_mean={float(jnp.mean(jnp.abs(grad))):.2e}")


def fig_indirect_reparam(base, scale):
    """Secondary-gradient ablation (reference Fig. 13,
    figures/indirect_reparam/indirect_reparam.py:23-33): reconstruct the
    torus-shadow scene (signal = cast shadow) with primary-only
    reparameterization (max_reparam_depth=0, 'warpprimary') vs full reparam
    ('warp'), and the mirror-opt scene with 'warpprbprimary' vs 'warpprb'.
    Full reparameterization of secondary (shadow / reflected) rays must
    reach a lower final loss — the paper's Fig. 13 claim."""
    out = _outdir(base, "indirect_reparam")
    n_iter = 20 if scale == "small" else 96
    res = 40 if scale == "small" else 128
    pairs = [
        ("torus-shadow", ["warpprimary", "warp"]),
        ("mirror-opt", ["warpprbprimary", "warpprb"]),
    ]
    curves, meta, rows, row_titles = [], {}, [], []
    palette = {"warpprimary": "#E69F00", "warp": "#0072B2",
               "warpprbprimary": "#D55E00", "warpprb": "#56B4E9"}
    for sc, methods in pairs:
        for m in methods:
            t0 = time.time()
            r = _smoke_opt(sc, method=m, n_iter=n_iter, res=res,
                           out_dir=os.path.join(out, f"{sc}-{m}"))
            curves.append((f"{sc} [{m}]", palette[m],
                           [float(v) for v in r.loss_values]))
            meta[f"{sc}/{m}"] = {"final_loss": float(r.loss_values[-1]),
                                 "time_s": round(time.time() - t0, 1)}
            rows.append([_render_final(r)])
            row_titles.append(f"{sc} {m}")
    _loss_plot(os.path.join(out, "indirect_reparam_losses.png"), curves,
               "primary-only vs full reparameterization")
    _save_image_grid(os.path.join(out, "indirect_reparam.png"), rows,
                     row_titles, ["reconstruction"])
    json.dump(meta, open(os.path.join(out, "meta.json"), "w"), indent=1)
    print(f"[indirect_reparam] {meta}")


def fig_limitations(base, scale):
    """Limitations on complex geometry (reference Fig. 16,
    figures/limitations/limitations.py: the lego excavator at hqq keeps
    only coarse structure).  Smoke-scale analog: reconstruct the 'lego'
    stand-in (axis-aligned thin cube assembly) and report target vs
    reconstruction + the loss floor — thin features below the grid/film
    resolution are lost, the documented limitation."""
    out = _outdir(base, "limitations")
    n_iter = 28 if scale == "small" else 128
    res = 48 if scale == "small" else 256
    sdf_res = 16 if scale == "small" else 64
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
    from differentiable_sdf_rendering_tpu.models.scene import Scene
    from differentiable_sdf_rendering_tpu.models.scenes_zoo import scene_rig, target_sdf
    from differentiable_sdf_rendering_tpu.ops.sdf import GridSDF

    result = _smoke_opt("lego", n_iter=n_iter, res=res, sdf_res=sdf_res,
                        out_dir=os.path.join(out, "lego"))
    recon = _render_final(result)
    bsdf, emitter = scene_rig("lego")
    tgt = Scene(
        sdf=GridSDF.create(target_sdf("lego", 64)), bsdf=bsdf, emitter=emitter,
        cameras=result.scene.cameras, mesh=None, area_emitter=None,
    )
    timg = jnp.clip(render(tgt, 0, seed=7, cfg=RenderConfig(spp=48))[..., :3], 0, 1)
    _save_image_grid(os.path.join(out, "limitations.png"),
                     [[timg, recon]], ["lego"], ["target", "reconstruction"])
    _loss_plot(os.path.join(out, "losses.png"),
               [("lego", "#0072B2", [float(v) for v in result.loss_values])],
               "limitations: complex thin geometry")
    json.dump({"final_loss": float(result.loss_values[-1]),
               "first_loss": float(result.loss_values[0])},
              open(os.path.join(out, "meta.json"), "w"), indent=1)
    print(f"[limitations] final_loss={float(result.loss_values[-1]):.4f}")


def fig_sdf2d(base, scale):
    """2-D executable spec of the weighted trace (reference
    figures/disk_tracing.py + figures/sdf): warp_t vs its_t along a pencil of
    rays past a disk, and the weight accumulation along one ray."""
    out = _outdir(base, "sdf2d")
    import numpy as np

    from differentiable_sdf_rendering_tpu.ops.sdf2d import DiskSDF, trace_2d

    plt = _mpl()
    disk = DiskSDF.create(p=(0.5, 0.5), r=0.25)
    n = 256
    import jax.numpy as jnp

    ys = jnp.linspace(0.05, 0.95, n)
    o = jnp.stack([jnp.zeros(n), ys], axis=-1)
    d = jnp.broadcast_to(jnp.array([1.0, 0.0]), (n, 2))
    r = trace_2d(disk, o, d)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.4))
    ax1.plot(np.asarray(ys), np.asarray(r["its_t"]), color="#0072B2", lw=2,
             label="intersection t")
    wt = np.asarray(r["warp_t"])
    ax1.plot(np.asarray(ys), np.where(np.isfinite(wt), wt, np.nan),
             color="#E69F00", lw=2, label="warp_t (weighted mean)")
    ax1.set_xlabel("ray offset y")
    ax1.set_ylabel("t")
    ax1.set_ylim(0, 1.2)
    ax1.legend(frameon=False, fontsize=8)
    ax1.set_title("2-D disk: warp depth extends past the silhouette", fontsize=9)
    ax2.plot(np.asarray(ys), np.asarray(r["weight_sum"]), color="#009E73", lw=2)
    ax2.set_yscale("log")
    ax2.set_xlabel("ray offset y")
    ax2.set_ylabel("accumulated weight")
    ax2.set_title("silhouette weight concentrates at grazing rays", fontsize=9)
    for ax in (ax1, ax2):
        ax.grid(True, alpha=0.25, lw=0.5)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "disk_tracing.png"), dpi=140)
    print(f"[sdf2d] -> {out}")


def fig_teaser(base, scale):
    """Turntable strip of an optimized shape (reference teaser)."""
    out = _outdir(base, "teaser")
    import jax.numpy as jnp

    from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
    from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render

    n_iter = 24 if scale == "small" else 96
    result = _smoke_opt("dragon", n_iter=n_iter, out_dir=os.path.join(out, "opt"))
    n_frames = 4 if scale == "small" else 8
    res = 64 if scale == "small" else 256
    cams = regular_cameras(n_frames, resx=res, resy=res)
    frames = []
    for k in range(n_frames):
        img = render(result.scene.replace(cameras=cams), k, seed=3,
                     cfg=RenderConfig(spp=32))
        frames.append(jnp.clip(img[..., :3], 0, 1))
    _save_image_grid(os.path.join(out, "teaser.png"), [frames], ["turntable"],
                     [f"view {k}" for k in range(n_frames)])
    print(f"[teaser] -> {out}")


def _sub(script, *args):
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), script), *args]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


FIGURES = {
    "opt_results": fig_opt_results,
    "conv_opt_results": fig_conv_opt_results,
    "shading_gradients": fig_shading_gradients,
    "normalization": fig_normalization,
    "nested_reparam": fig_nested_reparam,
    "indirect_reparam": fig_indirect_reparam,
    "limitations": fig_limitations,
    "sdf2d": fig_sdf2d,
    "teaser": fig_teaser,
}
SUBPROCESS_FIGURES = ("benchmark", "forwardgrads", "warp_fields")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--figures", default="all",
                    help=f"comma list of {sorted(FIGURES) + list(SUBPROCESS_FIGURES)} or 'all'")
    ap.add_argument("--scale", choices=["small", "full"], default="small")
    ap.add_argument("--out", default="output/figures")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from differentiable_sdf_rendering_tpu.utils.platform import force_cpu

        force_cpu()

    names = (list(FIGURES) + list(SUBPROCESS_FIGURES)) if args.figures == "all" \
        else [s.strip() for s in args.figures.split(",")]
    os.makedirs(args.out, exist_ok=True)
    cpu_flag = ["--cpu"] if args.cpu else []
    t0 = time.time()
    for name in names:
        t1 = time.time()
        if name in FIGURES:
            FIGURES[name](args.out, args.scale)
        elif name == "benchmark":
            _sub("benchmark_methods.py", "--scale",
                 "small" if args.scale == "small" else "full",
                 "--out", os.path.join(args.out, "benchmark"), *cpu_flag)
        elif name == "forwardgrads":
            _sub("forwardgrads.py", "--res", "48" if args.scale == "small" else "128",
                 "--spp", "16" if args.scale == "small" else "64",
                 "--fd-spp", "128" if args.scale == "small" else "1024",
                 "--n-seeds", "2" if args.scale == "small" else "4",
                 "--grid", "32" if args.scale == "small" else "64",
                 "--out", os.path.join(args.out, "forwardgrads"), *cpu_flag)
        elif name == "warp_fields":
            _sub("warp_visualization.py", "--res", "64" if args.scale == "small" else "128",
                 "--grid", "32" if args.scale == "small" else "64",
                 "--out", os.path.join(args.out, "warp_fields"), *cpu_flag)
        else:
            raise SystemExit(f"unknown figure '{name}'")
        print(f"[{name}] done in {time.time() - t1:.1f}s", flush=True)
    print(f"all figures done in {time.time() - t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
