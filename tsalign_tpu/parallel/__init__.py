"""Multi-chip execution: batched pair alignment over a jax.sharding.Mesh."""
