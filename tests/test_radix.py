"""Radix pipeline (`method='radix'`): histogram, offsets, full LSD sort.

Reference counterparts: the blockSum/reorder WGSL kernels and their
digit-major block-sum invariant (`src/shaders/RadixSort.ts:110-114`,
`RadixSortReorder.ts:97-101`), tested the way `example/tests.ts` does —
randomized sweeps against a CPU oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_sort
from tpu_radix_sort.ops import radix


def test_digit_histogram_digit_major(rng):
    rows, block_rows = 64, 16
    u = rng.integers(0, 2**32, rows * 128, dtype=np.uint64).astype(np.uint32)
    u2 = jnp.asarray(u).reshape(rows, 128)
    for bit in (0, 8, 30):
        hist = np.asarray(radix.digit_histogram(u2, bit=bit, block_rows=block_rows))
        assert hist.shape == (4, rows // block_rows)
        dig = (u >> bit) & 3
        blocks = dig.reshape(rows // block_rows, block_rows * 128)
        for r in range(4):
            np.testing.assert_array_equal(hist[r], (blocks == r).sum(axis=1))


def test_bucket_offsets(rng):
    hist = jnp.asarray(rng.integers(0, 100, (4, 8), dtype=np.uint64).astype(np.uint32))
    offs = np.asarray(radix.bucket_offsets(hist))
    flat = np.asarray(hist).reshape(-1).astype(np.uint64)
    expect = np.concatenate([[0], np.cumsum(flat)[:-1]]).astype(np.uint32)
    np.testing.assert_array_equal(offs.reshape(-1), expect)


@pytest.mark.parametrize("n", [100, 4096])
def test_radix_sort_keys(rng, n):
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    got = trs.sort(jnp.asarray(k), method="radix", block_rows=16)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(k))


@pytest.mark.slow
def test_radix_sort_keys_large(rng):
    k = rng.integers(0, 2**32, 50000, dtype=np.uint64).astype(np.uint32)
    got = trs.sort(jnp.asarray(k), method="radix", block_rows=16)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(k))


def test_radix_sort_kv_stable_and_flags(rng):
    n = 6000
    k = rng.integers(0, 2**8, n, dtype=np.uint64).astype(np.uint32)  # dupes
    v = np.arange(n, dtype=np.uint32)
    gk, gv = trs.sort(jnp.asarray(k), jnp.asarray(v), method="radix",
                      bit_count=16, block_rows=16)
    rk, rv = golden_sort(k, v, bit_count=16)
    np.testing.assert_array_equal(np.asarray(gk), rk)
    np.testing.assert_array_equal(np.asarray(gv), rv)  # stability

    # bit_count masking + sub-count suffix preservation
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    got = trs.sort(jnp.asarray(k), method="radix", bit_count=8, count=4321,
                   block_rows=16)
    np.testing.assert_array_equal(
        np.asarray(got), golden_sort(k, bit_count=8, count=4321)
    )


def test_radix_sort_float32(rng):
    f = (rng.random(3000, dtype=np.float32) * 50).astype(np.float32)
    got = trs.sort(jnp.asarray(f), method="radix", bit_count=16, block_rows=16)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(f, bit_count=16))
