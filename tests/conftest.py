"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); the real TPU chip is used by
``bench.py`` only.  Must run before the first backend initializes.

The image's ``sitecustomize`` pre-imports jax pinned to the remote-TPU
('axon') platform; pinning ``jax_platforms`` to cpu *before any backend
initializes* routes both execution and compilation locally.  (We keep the
axon backend factory registered — dropping it would unregister the 'tpu'
MLIR platform and break ``jax.experimental.pallas`` imports, which the
Pallas-kernel tests need in interpret mode.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax was already imported by sitecustomize, so the env var alone is not
# enough — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
