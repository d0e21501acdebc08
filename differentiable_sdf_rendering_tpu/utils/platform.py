"""Platform pinning helpers for this image's remote-TPU environment.

The image's ``sitecustomize`` imports jax and pins the 'axon' remote-TPU
platform before user code runs, so ``JAX_PLATFORMS=cpu`` set later is
ignored and even CPU work round-trips through the remote compile relay.
``force_cpu()`` performs the full local-CPU pin (used by tests/conftest.py
and all ``--cpu`` script flags).
"""

from __future__ import annotations

import os

__all__ = ["force_cpu"]


def force_cpu(virtual_devices: int | None = None):
    os.environ["JAX_PLATFORMS"] = "cpu"
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    import jax

    # Pin the platform (works even though sitecustomize already imported
    # jax, as long as no backend has initialized).  Keep backend factories
    # registered: dropping the axon factory unregisters the 'tpu' MLIR
    # platform and breaks jax.experimental.pallas imports.
    jax.config.update("jax_platforms", "cpu")
