"""Regenerate the checked-in scene assets (scenes/assets/) with the own
mesh→SDF pipeline — the role of the reference's downloadable scene data
(`/root/reference/README.md:66-68`; VERDICT r1 #8).

Produces, deterministically:
  * scenes/assets/sdfs/{trefoil,blob}_{64,128}.vol — SDF volumes voxelized
    from non-trivial watertight meshes (knotted trefoil tube, displaced
    blob) via native occupancy + exact triangle distances + redistancing
    (utils/mesh.create_sdf);
  * scenes/assets/golden/{name}_direct_s0.exr — golden primal renders at a
    fixed seed/spp for regression (tests/test_assets.py).

Run: JAX_PLATFORMS=cpu python scripts/build_assets.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.models.scenes_zoo import ASSET_DIR, target_sdf
from differentiable_sdf_rendering_tpu.utils.io import write_exr, write_vol
from differentiable_sdf_rendering_tpu.utils.mesh import blob, cinquefoil, create_sdf, trefoil

MESHES = {"trefoil": trefoil, "blob": blob, "cinquefoil": cinquefoil}
# hq/hqq-scale asset: the thin-strand knot additionally at 256^3
HQ_MESHES = {"cinquefoil": (256,)}
GOLDEN_RES = 64
GOLDEN_SPP = 16


def make_studio_hdr(h=128, w=256):
    """Visually rich equirect HDR: gradient sky + warm/cool softboxes + a
    hard sun — the role of the reference's real envmap assets
    (``emitters/cathedral.xml``).  Deterministic, float32, peak ≈ 60."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    d = np.stack(
        [st * np.cos(phi)[None, :],
         np.broadcast_to(np.cos(theta)[:, None], (h, w)),
         st * np.sin(phi)[None, :]], -1)

    def lobe(dir_, power):
        dir_ = np.asarray(dir_, np.float32)
        dir_ = dir_ / np.linalg.norm(dir_)
        return np.maximum(d @ dir_, 0.0) ** power

    m = (d[..., 1:2] + 1.0) * 0.5
    img = m * np.array([0.35, 0.45, 0.75]) + (1 - m) * np.array([0.08, 0.07, 0.06])
    img = img + lobe((0.8, 0.5, 0.2), 400.0)[..., None] * np.array([55.0, 50.0, 40.0])
    img = img + lobe((-0.6, 0.6, 0.4), 30.0)[..., None] * np.array([2.0, 2.3, 3.2])
    img = img + lobe((0.1, 0.3, -0.9), 60.0)[..., None] * np.array([3.5, 2.2, 1.2])
    # dim ground bounce card
    img = img + lobe((0.0, -1.0, 0.0), 8.0)[..., None] * np.array([0.25, 0.22, 0.18])
    return img.astype(np.float32)


def main():
    sdf_dir = os.path.join(ASSET_DIR, "sdfs")
    golden_dir = os.path.join(ASSET_DIR, "golden")
    env_dir = os.path.join(ASSET_DIR, "envmaps")
    os.makedirs(sdf_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)
    os.makedirs(env_dir, exist_ok=True)

    hdr = make_studio_hdr()
    hdr_fn = os.path.join(env_dir, "studio_sky.exr")
    write_exr(hdr_fn, hdr)
    print(f"[envmap] {hdr.shape} peak={hdr.max():.1f} -> {hdr_fn}")

    for name, gen in MESHES.items():
        verts, tris = gen()
        print(f"[{name}] mesh: {len(verts)} verts, {len(tris)} tris")
        for res in (64, 128) + HQ_MESHES.get(name, ()):
            sdf = np.asarray(create_sdf((verts, tris), res=res))
            fn = os.path.join(sdf_dir, f"{name}_{res}.vol")
            write_vol(fn, sdf)
            inside = float((sdf < 0).mean())
            print(f"[{name}] {res}^3 -> {fn}  (inside fraction {inside:.4f})")

    for name in MESHES:
        data = target_sdf(name, GOLDEN_RES)  # reads the .vol just written
        scene = Scene.create(
            data, cameras=regular_cameras(2, resx=GOLDEN_RES, resy=GOLDEN_RES)
        )
        cfg = RenderConfig(integrator="sdf_direct_reparam", spp=GOLDEN_SPP)
        img = np.asarray(render(scene, 0, seed=0, cfg=cfg, mode="primal"))[..., :3]
        fn = os.path.join(golden_dir, f"{name}_direct_s0.exr")
        write_exr(fn, img)
        print(f"[{name}] golden render mean={img.mean():.5f} -> {fn}")


if __name__ == "__main__":
    main()
