"""Multi-chip scaling: sharding plans over jax.sharding.Mesh."""
