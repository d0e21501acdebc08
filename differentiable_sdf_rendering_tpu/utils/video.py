"""Turntable renders and convergence videos.

Ports of the reference's ``render_turntable`` / ``run_ffmpeg``
(``/root/reference/python/util.py:25-70``) and the convergence-grid video
assembly (``python/create_video.py:28-81``).  ffmpeg is optional — frames
are always written; the video step is skipped with a note if ffmpeg is
missing.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from os.path import join

import numpy as np

from ..models.camera import turntable_cameras
from ..models.integrator import RenderConfig, render_chunked
from .io import tonemap, write_png

__all__ = ["render_turntable", "run_ffmpeg", "convergence_video"]


def run_ffmpeg(frame_pattern: str, video_path: str):
    """frames → h264 mp4 (util.py:59-70); no-op if ffmpeg is absent."""
    if shutil.which("ffmpeg") is None:
        print("Cannot find ffmpeg, skipping video generation")
        return False
    cmd = (
        f"ffmpeg -y -hide_banner -loglevel error -i {frame_pattern} -c:v libx264 "
        f"-movflags +faststart -vf format=yuv420p -crf 15 -nostdin {video_path}"
    )
    subprocess.call(cmd, shell=True)
    return True


def render_turntable(scene, output_dir, resx=128, resy=128, spp=64, n_frames=64, cfg=None, n_chunks=1):
    """Turntable frames + video of the current scene (util.py:25-56)."""
    import dataclasses

    frame_dir = join(output_dir, "turntable")
    os.makedirs(frame_dir, exist_ok=True)
    cfg = cfg or RenderConfig()
    cfg = dataclasses.replace(cfg, spp=spp)
    # Prepare the stencil table EAGERLY: an unprepared grid auto-prepares
    # inside the render jit, where the traceable builder's (N, 1) column
    # operands pad 128× under the TPU tile — ~1.07 GB per slice op at 128³
    # (observed compile OOM on the r5 hq turntable)
    if getattr(scene.sdf, "stencil", 1) is None:
        scene = scene.replace(sdf=scene.sdf.prepare())
    cams = turntable_cameras(n_frames, resx=resx, resy=resy)
    for frame in range(n_frames):
        img = render_chunked(
            scene, seed=frame, cfg=cfg, mode="primal",
            camera=cams.view(frame), n_chunks=n_chunks,
        )
        write_png(join(frame_dir, f"frame-{frame:04d}.png"), np.asarray(img[..., :3]))
    video_dir = join(output_dir, "video")
    os.makedirs(video_dir, exist_ok=True)
    run_ffmpeg(join(frame_dir, "frame-%04d.png"), join(video_dir, "turntable.mp4"))


def convergence_video(output_dir, opt_images, ref_images, n_cols=3):
    """Tile per-view optimization frames against references into a grid
    video (create_video.py:28-81).  ``opt_images``: {iter: [(H,W,3)...]}."""
    frame_dir = join(output_dir, "convergence")
    os.makedirs(frame_dir, exist_ok=True)
    iters = sorted(opt_images)
    refs = [tonemap(np.asarray(r)) for r in ref_images]
    for fi, it in enumerate(iters):
        imgs = [tonemap(np.asarray(im)) for im in opt_images[it]]
        rows = []
        for start in range(0, len(imgs), n_cols):
            row_imgs = imgs[start : start + n_cols]
            row_refs = refs[start : start + n_cols]
            pad = lambda lst: lst + [np.zeros_like(lst[0])] * (n_cols - len(lst))
            rows.append(np.concatenate(pad(row_imgs), axis=1))
            rows.append(np.concatenate(pad(row_refs), axis=1))
        grid = np.concatenate(rows, axis=0)
        write_png(join(frame_dir, f"conv-{fi:04d}.png"), grid)
    run_ffmpeg(join(frame_dir, "conv-%04d.png"), join(output_dir, "video", "convergence.mp4"))
