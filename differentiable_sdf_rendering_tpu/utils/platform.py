"""Platform pinning helpers for this image's remote-TPU environment.

The image's ``sitecustomize`` imports jax and pins the 'axon' remote-TPU
platform before user code runs, so ``JAX_PLATFORMS=cpu`` set later is
ignored and even CPU work round-trips through the remote compile relay.
``force_cpu()`` performs the full local-CPU pin (used by tests/conftest.py
and all ``--cpu`` script flags).
"""

from __future__ import annotations

import os

__all__ = ["force_cpu", "enable_compile_cache"]


def enable_compile_cache(path: str | None = None):
    """Persistent XLA compilation cache for device (bench/profile) runs.

    Remote-TPU compiles of the big render/VJP programs take minutes and
    worker crashes force re-runs; caching compiled executables client-side
    makes a retried measurement session start ~warm.  Best-effort: a
    backend whose executables don't serialize just ignores the cache.
    """
    import jax

    cache = path or os.environ.get(
        "SDF_COMPILE_CACHE", os.path.expanduser("~/.cache/sdf_tpu_compile_cache")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — strictly an optimization
        pass


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
