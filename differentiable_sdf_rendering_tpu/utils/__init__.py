"""I/O and misc utilities."""

from . import io  # noqa: F401
