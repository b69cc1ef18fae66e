"""Multi-chip layer: distributed sort over `jax.sharding.Mesh`."""
from .mesh_sort import mesh_sort, sharded

__all__ = ["mesh_sort", "sharded"]
