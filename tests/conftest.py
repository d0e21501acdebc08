"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); the real TPU chip is used by
``bench.py`` only.  Must run before the first ``import jax``.
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via
# sitecustomize; tests must run locally on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize registers the remote-TPU ("axon") PJRT plugin in every
# process; its remote-compile relay slows even CPU-backend tests by ~10x.
# Drop the factory before any backend initializes.
try:
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu",):
            _xb._backend_factories.pop(_name, None)
except Exception:  # pragma: no cover - best effort
    pass

# jax was already imported by sitecustomize, so the env var alone is not
# enough — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
