"""Device-mesh sharding of views and rays."""
