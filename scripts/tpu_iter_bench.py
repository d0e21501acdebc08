#!/usr/bin/env python3
"""Wall-clock per optimization iteration on dragon no-tex-12 (the
BASELINE.json headline) at the reference's real configuration: 128² film,
64³ SDF (pre-upsampling), batch 6 of 12 views, 256 primal + 64 grad spp.

Runs a few iterations on the current JAX device and reports secs/iter
excluding compile, plus the per-iteration ray throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_iter = int(os.environ.get("ITERS", "6"))
    import dataclasses

    import jax

    from differentiable_sdf_rendering_tpu.opt.configs import get_config
    from differentiable_sdf_rendering_tpu.opt.opt_configs import get_opt_config
    from differentiable_sdf_rendering_tpu.opt.shape_opt import optimize_shape

    mc = get_config("warp")           # spp 64, primal_spp_mult 4 (reference defaults)
    name = os.environ.get("ITER_CONFIG", "no-tex-12")
    oc, _ = get_opt_config(name)
    # ITER_PHASE=final: measure the config's FINAL phase (full SDF res +
    # full film) instead of the initial one — start directly at the target
    # resolution with the schedules emptied (the hq/hqq flagship question:
    # VERDICT r2 #3's "a no-tex-12-hq training iteration timed on device")
    if os.environ.get("ITER_PHASE") == "final":
        # resx/resy ARE the final film resolution (SdfConfig ramps UP TO
        # them via render_upsample_iter); only the schedules are emptied so
        # iteration 0 starts at the final SDF res + final film res.
        oc = dataclasses.replace(oc, upsample_iter=(), render_upsample_iter=())
    if os.environ.get("ITER_FILM"):
        # e.g. hqq's 256³-grid × 256²-film MID phase (iters 270-300 of its
        # schedule): ITER_PHASE=final ITER_FILM=256 — the full-film final
        # phase (512²) is the program class that crashes this v5e worker
        # (BASELINE.md r5 hqq status)
        fr = int(os.environ["ITER_FILM"])
        oc = dataclasses.replace(oc, resx=fr, resy=fr)
    times = []

    def cb(i, params, losses):
        times.append(time.perf_counter())

    # Bound every render program to ≤ ~300 k lanes (the class proven safe on
    # this v5e): one no-tex-12 view primal is 132²·256 ≈ 4.5 M lanes, so the
    # per-view wavefront is scanned in chunks (render_chunked's remat scan).
    chunks = int(os.environ.get("ITER_CHUNKS", "16"))
    t0 = time.time()
    res = optimize_shape(
        "dragon", oc, mc, output_dir=None, ref_spp=int(os.environ.get("REF_SPP", "256")),
        n_iter=n_iter, verbose=True, checkpoint_cb=cb, render_chunks=chunks,
    )
    steady = [t1 - t0_ for t0_, t1 in zip(times[1:-1], times[2:])]
    per_iter = sum(steady) / max(len(steady), 1) if steady else float("nan")
    # batch × (res+2b)² × (primal + grad) spp
    batch = oc.batch_size or oc.n_sensors
    rays = batch * (oc.resx + 4) * (oc.resy + 4) * (
        mc.spp * mc.primal_spp_mult + mc.spp
    )
    print(json.dumps({
        "metric": f"wall-clock per opt iteration, dragon {name}"
                  + (" (final phase)" if os.environ.get("ITER_PHASE") == "final" else ""),
        "value": round(per_iter, 3),
        "unit": "s/iter",
        "rays_per_iter": rays,
        "rays_per_s": round(rays / per_iter, 1) if per_iter == per_iter else None,
        "total_time": round(res.total_time, 1),
        "n_iter": n_iter,
        "platform": jax.devices()[0].platform,
        "losses": [round(l, 5) for l in res.loss_values],
    }))


if __name__ == "__main__":
    main()
