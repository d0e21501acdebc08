#!/usr/bin/env python3
"""Diagnose the PRB-vs-direct cross-check margin (tests/test_prb.py):
per-seed gradients of both integrators on the area-silhouette scene, to
size the MC σ and the systematic offset so the test bound can be set to
a principled ≤0.15 (VERDICT r4 #8)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentiable_sdf_rendering_tpu.utils.platform import enable_compile_cache, force_cpu

force_cpu()
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from differentiable_sdf_rendering_tpu.models.bsdf import DiffuseBSDF
from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.emitter import AreaEmitter, ConstantEmitter
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf


def _set_p(scene, p):
    return scene.replace(sdf=scene.sdf.replace(p=p))


panel = AreaEmitter.create(
    corner=(-0.6, 0.0, 0.0), e0=(0.0, 1.0, 0.0), e1=(0.0, 0.0, 1.0),
    radiance=(5.0, 5.0, 5.0),
)
scene = Scene.create(
    create_sphere_sdf(24, radius=0.22),
    bsdf=DiffuseBSDF.create(albedo=(0.0, 0.0, 0.0)),
    emitter=ConstantEmitter.create((0.0, 0.0, 0.0)),
    area_emitter=panel,
    cameras=regular_cameras(2, resx=20, resy=20),
)
cfg_ad = RenderConfig(integrator="sdf_prb_reparam", spp=32, max_depth=2)
cfg_dir = RenderConfig(integrator="sdf_direct_reparam", spp=32)

p0 = jnp.zeros(3)


@jax.jit
def g_prb(p, seed):
    return jax.grad(lambda q: jnp.sum(
        render(_set_p(scene, q), 0, seed=seed, cfg=cfg_ad, mode="grad")[..., :3]))(p)


@jax.jit
def g_dir(p, seed):
    return jax.grad(lambda q: jnp.sum(
        render(_set_p(scene, q), 0, seed=seed, cfg=cfg_dir, mode="grad")[..., :3]))(p)


n = int(os.environ.get("N_SEEDS", "16"))
A = np.stack([np.asarray(g_prb(p0, s)) for s in range(n)])
D = np.stack([np.asarray(g_dir(p0, s)) for s in range(n)])
for k in (0, 1):
    ma, md = A[:, k].mean(), D[:, k].mean()
    sa, sd = A[:, k].std(ddof=1) / np.sqrt(n), D[:, k].std(ddof=1) / np.sqrt(n)
    print(f"axis {k}: prb {ma:+.3f}±{sa:.3f}  dir {md:+.3f}±{sd:.3f}  "
          f"rel {abs(ma - md) / abs(md):.3f}")
    print(f"  per-seed prb: {np.round(A[:, k], 3).tolist()}")
    print(f"  per-seed dir: {np.round(D[:, k], 3).tolist()}")
