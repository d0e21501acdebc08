"""Device-mesh sharding of views and rays."""

from . import sharding  # noqa: F401
