"""Distributed batched (per-row) sorts on a virtual mesh.

Rows shard across the batch axis with zero collectives
(`parallel/batched.py`); output must be byte-exact vs the single-chip
row-local engine, including when the batch count doesn't divide the
device count (dummy-row padding, sliced off).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("x",))


@pytest.mark.parametrize("n_dev,B,n", [(2, 4, 500), (8, 16, 1024), (8, 13, 257)])
def test_mesh_batched_matches_single_chip(rng, n_dev, B, n):
    mesh = make_mesh(n_dev)
    k = rng.integers(0, 2**32, (B, n), dtype=np.uint64).astype(np.uint32)
    v = np.tile(np.arange(n, dtype=np.uint32), (B, 1))
    got_k, got_v = trs.sort_batched(jnp.asarray(k), jnp.asarray(v), mesh=mesh)
    ref_k, ref_v = trs.sort_batched(jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_k), np.sort(k, axis=1))


def test_mesh_argsort_batched_and_options(rng):
    mesh = make_mesh(8)
    B, n = 11, 512  # 11 rows over 8 devices: pad + slice path
    k = rng.integers(0, 50, (B, n), dtype=np.uint64).astype(np.uint32)
    perm = np.argsort(k, axis=1, kind="stable").astype(np.uint32)
    got = trs.argsort_batched(jnp.asarray(k), mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), perm)

    f = rng.standard_normal((8, 256)).astype(np.float32)
    down = trs.sort_batched(
        jnp.asarray(f), mesh=mesh, descending=True, total_order=True)
    ref = trs.sort_batched(
        jnp.asarray(f), descending=True, total_order=True)
    np.testing.assert_array_equal(
        np.asarray(down).view(np.uint32), np.asarray(ref).view(np.uint32))


def test_mesh_batched_respects_input_sharding(rng):
    """When B divides the device count, inputs placed P('x', None) stay
    row-sharded end to end (no cross-device data movement at all)."""
    mesh = make_mesh(4)
    B, n = 8, 256
    k = rng.integers(0, 2**32, (B, n), dtype=np.uint64).astype(np.uint32)
    ks = jax.device_put(jnp.asarray(k), NamedSharding(mesh, P("x", None)))
    got = trs.sort_batched(ks, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), np.sort(k, axis=1))
