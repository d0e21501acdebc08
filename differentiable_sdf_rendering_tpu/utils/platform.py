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

    try:
        from jax._src import xla_bridge as _xb

        for name in list(getattr(_xb, "_backend_factories", {})):
            if name != "cpu":
                _xb._backend_factories.pop(name, None)
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
