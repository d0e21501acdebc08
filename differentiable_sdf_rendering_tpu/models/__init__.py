"""Scene model: cameras, BSDFs, emitters, integrators."""
