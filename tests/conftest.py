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

# The suite is dominated by first-compiles of the render/VJP programs
# (~40 min cold).  A persistent compilation cache makes re-runs cheap, and
# `pytest -n 4` (pytest-xdist) parallelizes the cold run itself.
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE", os.path.expanduser("~/.cache/jax_test_compilation_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache flags unavailable on this jax version: run cold
    pass
