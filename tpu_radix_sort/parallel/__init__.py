"""Multi-chip layer: distributed sort over `jax.sharding.Mesh`.

Two exchange strategies:
- :func:`mesh_sort` — bitonic compare-split network (fixed-size ppermute
  exchanges, log^2(D) rounds; best at small D)
- :func:`exchange_sort` — exact-splitter radix exchange (one ragged
  all-to-all; best at pod scale; skew-immune by rank-based splitting)
"""
from .mesh_sort import mesh_sort, sharded
from .radix_exchange import exchange_sort

__all__ = ["mesh_sort", "exchange_sort", "sharded"]
