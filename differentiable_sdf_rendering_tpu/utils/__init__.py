"""I/O and misc utilities."""
