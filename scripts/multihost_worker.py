import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
sys.path.insert(0, "/root/repo")
from differentiable_sdf_rendering_tpu.utils.platform import force_cpu
force_cpu(virtual_devices=4)
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:9876", num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
sys.path.insert(0, "/root/repo")
from differentiable_sdf_rendering_tpu.models.camera import regular_cameras
from differentiable_sdf_rendering_tpu.models.integrator import RenderConfig, render_lane_block
from differentiable_sdf_rendering_tpu.models.scene import Scene
from differentiable_sdf_rendering_tpu.ops.film import BORDER, develop
from differentiable_sdf_rendering_tpu.ops.initializers import create_sphere_sdf
import functools

devs = np.asarray(jax.devices()).reshape(nproc, 4)   # hosts × local chips
mesh = Mesh(devs, ("views", "rays"))
scene = Scene.create(create_sphere_sdf(16, 0.3), cameras=regular_cameras(2, resx=16, resy=16))
cfg = RenderConfig(spp=8)
cam = scene.cameras.view(0)
n = (16 + 2*BORDER)**2 * cfg.spp

@functools.partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(("views","rays"))), out_specs=P(), check_vma=False)
def run(scene_rep, lanes):
    block = render_lane_block(scene_rep, cam, lanes[:, 0], 0, cfg, "primal")
    return jax.lax.psum(block, ("views", "rays"))

with mesh:
    lanes = jnp.arange(n, dtype=jnp.uint32)[:, None]
    img = develop(run(scene, lanes), border=BORDER)
s = float(img[..., :3].sum())
print(f"[proc {pid}] multihost render sum = {s:.4f}", flush=True)
