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
from tpu_radix_sort.parallel.radix_exchange import (
    exchange_sort,
    ragged_all_to_all_emulated,
)
from jax.sharding import Mesh, PartitionSpec as P


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


def test_emulation_matches_ragged_all_to_all_semantics(rng):
    """Pin the CPU emulation to `jax.lax.ragged_all_to_all`'s documented
    operational semantics (XLA:CPU cannot run the real collective —
    `UNIMPLEMENTED: HLO opcode ragged-all-to-all ... ThunkEmitter` on
    jax 0.9.0 — so the equivalence oracle is an independent NumPy model):
    shard s's slice [starts[s,d], starts[s,d]+sizes[s,d]) lands in shard
    d's output at offset out_offsets[s,d]; untouched output positions keep
    the destination buffer's initial value (zeros here)."""
    D, L = 8, 64
    mesh = make_mesh(D)
    data = rng.integers(0, 2**32, size=(D, L), dtype=np.uint32)

    for trial in range(3):
        # random ragged metadata: per-source contiguous send layout, and
        # per-destination column sums <= L so every chunk fits
        sizes = rng.integers(0, L // D + 1, size=(D, D)).astype(np.int32)
        starts = np.zeros((D, D), np.int32)
        starts[:, 1:] = np.cumsum(sizes, axis=1)[:, :-1]
        out_offsets = np.zeros((D, D), np.int32)
        out_offsets[1:, :] = np.cumsum(sizes, axis=0)[:-1, :]

        # independent NumPy model of the documented semantics
        expect = np.zeros((D, L), np.uint32)
        for s in range(D):
            for d in range(D):
                sz = sizes[s, d]
                expect[d, out_offsets[s, d]:out_offsets[s, d] + sz] = \
                    data[s, starts[s, d]:starts[s, d] + sz]

        fn = jax.jit(
            jax.shard_map(
                lambda a: ragged_all_to_all_emulated(
                    a,
                    jnp.asarray(starts),
                    jnp.asarray(sizes),
                    jnp.asarray(out_offsets),
                    axis_name="x",
                    n_dev=D,
                ),
                mesh=mesh,
                in_specs=P("x"),
                out_specs=P("x"),
                check_vma=False,
            )
        )
        got = np.asarray(fn(jnp.asarray(data.reshape(-1)))).reshape(D, L)
        np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")


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


def test_exchange_sort_descending(rng):
    mesh = make_mesh(4)
    n = 1000
    keys = rng.integers(0, 2**8, size=n, dtype=np.uint32)  # dupes: stability
    values = np.arange(n, dtype=np.uint32)
    gk, gv = exchange_sort(
        sharded(mesh, "x", jnp.asarray(keys)),
        sharded(mesh, "x", jnp.asarray(values)),
        mesh=mesh,
        descending=True,
    )
    rk, rv = golden_sort(keys, values, descending=True)
    np.testing.assert_array_equal(np.asarray(gk), rk)
    np.testing.assert_array_equal(np.asarray(gv), rv)
