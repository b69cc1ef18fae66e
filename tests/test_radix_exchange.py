"""Exact-splitter radix-exchange distributed sort (single all-to-all).

Covers the skew cases the compare-split network is immune to by
construction: Zipf-hot buckets and all-equal keys, where value-based
partitioning would collapse — rank-based splitting must stay exactly
balanced and correct.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_radix_sort.models.golden import golden_sort
from tpu_radix_sort.parallel import sharded
from tpu_radix_sort.parallel.radix_exchange import exchange_sort
from jax.sharding import Mesh


def make_mesh(n):
    devs = jax.devices("cpu")[:n]
    return Mesh(np.array(devs), ("x",))


@pytest.mark.parametrize("n_dev,n", [(2, 512), (8, 20000)])
def test_exchange_sort_keys(rng, n_dev, n):
    mesh = make_mesh(n_dev)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    got = exchange_sort(sharded(mesh, "x", jnp.asarray(keys)), mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(keys))


def test_exchange_sort_kv_stability(rng):
    mesh = make_mesh(8)
    n = 10000
    keys = rng.integers(0, 2**6, size=n, dtype=np.uint32)  # heavy duplicates
    values = np.arange(n, dtype=np.uint32)
    gk, gv = exchange_sort(
        sharded(mesh, "x", jnp.asarray(keys)),
        sharded(mesh, "x", jnp.asarray(values)),
        mesh=mesh,
    )
    rk, rv = golden_sort(keys, values)
    np.testing.assert_array_equal(np.asarray(gk), rk)
    np.testing.assert_array_equal(np.asarray(gv), rv)


def test_exchange_sort_skew(rng):
    """Zipf-hot and all-equal keys: rank splitting must stay balanced."""
    mesh = make_mesh(8)
    n = 8192
    z = rng.zipf(1.2, size=n).astype(np.uint32)
    got = exchange_sort(sharded(mesh, "x", jnp.asarray(z)), mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(z))

    eq = np.full(n, 7, dtype=np.uint32)  # same shapes: reuses compilation
    v = np.arange(n, dtype=np.uint32)
    gk, gv = exchange_sort(
        sharded(mesh, "x", jnp.asarray(eq)),
        sharded(mesh, "x", jnp.asarray(v)),
        mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(gk), eq)
    np.testing.assert_array_equal(np.asarray(gv), v)


def test_exchange_sort_flags(rng):
    mesh = make_mesh(4)
    n = 5000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    got = exchange_sort(
        sharded(mesh, "x", jnp.asarray(keys)), mesh=mesh, bit_count=8,
        count=3333,
    )
    np.testing.assert_array_equal(
        np.asarray(got), golden_sort(keys, bit_count=8, count=3333)
    )
