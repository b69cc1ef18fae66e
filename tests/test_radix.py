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


@pytest.mark.slow
def test_radix_sort_large_sweep(rng):
    """Adversarial sweep of the window-DMA reorder at scale: key+value,
    duplicates, check_order, several tile heights (the same treatment the
    bitonic engine gets in test_sort.py::test_large_sort_with_merge_rounds)."""
    n = 50_000
    k = rng.integers(0, 2**12, n, dtype=np.uint64).astype(np.uint32)  # dupes
    v = np.arange(n, dtype=np.uint32)
    rk, rv = golden_sort(k, v, bit_count=16)
    for block_rows in (16, 64):
        gk, gv = trs.sort(jnp.asarray(k), jnp.asarray(v), method="radix",
                          bit_count=16, check_order=True, block_rows=block_rows)
        np.testing.assert_array_equal(np.asarray(gk), rk)
        np.testing.assert_array_equal(np.asarray(gv), rv)


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


def test_midsort_early_exit_skips_passes(rng):
    """The reference exits when data *becomes* sorted mid-run
    (`AbstractRadixSortKernel.ts:257-261`, README "Order checking"): the
    while_loop must stop after the check that follows the deciding pass."""
    n = 4000
    # keys < 16: fully determined by the low 4 bits => sorted after 2
    # passes; the check before pass 2 must exit the loop (n_run == 2)
    k = rng.integers(0, 16, n, dtype=np.uint64).astype(np.uint32)
    mk = jnp.asarray(k)
    out, _, n_run = radix.sort_u32(mk, (), check_order=True,
                                   block_rows=16, return_passes=True)
    assert int(n_run) == 2
    np.testing.assert_array_equal(np.asarray(out), np.sort(k))

    # already sorted: the pass-0 check exits before any pass runs
    out, _, n_run = radix.sort_u32(jnp.asarray(np.sort(k)), (),
                                   check_order=True, block_rows=16,
                                   return_passes=True)
    assert int(n_run) == 0

    # unsorted in the high bits: every pass must run
    k32 = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    out, _, n_run = radix.sort_u32(jnp.asarray(k32), (), check_order=True,
                                   block_rows=16, return_passes=True)
    assert int(n_run) == 16
    np.testing.assert_array_equal(np.asarray(out), np.sort(k32))


def test_radix_check_order_through_public_api(rng):
    n = 3000
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    gk, gv = trs.sort(jnp.asarray(k), jnp.asarray(v), method="radix",
                      bit_count=8, check_order=True, block_rows=16)
    rk, rv = golden_sort(k, v, bit_count=8)
    np.testing.assert_array_equal(np.asarray(gk), rk)
    np.testing.assert_array_equal(np.asarray(gv), rv)
    # sorted input passes through unchanged (and fast)
    ks = np.sort(k)
    gk2 = trs.sort(jnp.asarray(ks), method="radix", check_order=True,
                   block_rows=16)
    np.testing.assert_array_equal(np.asarray(gk2), ks)


def test_large_block_digit_skew_no_overflow(rng):
    """Regression (round-3 advisor, high): with block_rows=1024 a reorder
    block holds 131072 > 2^16 elements, so the packed 16-bit pair cumsums
    wrap mid-tile and silently corrupt deficits. Blocks past 2^16 elements
    must take the full-u32 cumsum path (`radix.py _reorder_kernel`)."""
    n = 131072
    k = (np.arange(n, dtype=np.uint32) % 4).astype(np.uint32)  # digit-skewed
    out, _ = radix.sort_u32(jnp.asarray(k), bit_count=4, block_rows=1024)
    np.testing.assert_array_equal(np.asarray(out), np.sort(k))
    # stability across the oversized block, with payload
    v = np.arange(n, dtype=np.uint32)
    k2 = rng.integers(0, 4, n, dtype=np.uint64).astype(np.uint32)
    ok, (ov,) = radix.sort_u32(jnp.asarray(k2), (jnp.asarray(v),),
                               bit_count=4, block_rows=1024)
    order = np.argsort(k2, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k2[order])
    np.testing.assert_array_equal(np.asarray(ov), v[order])


def test_packed_cumsum_wrap_edge_all_equal():
    """Boundary of the packed path: block_rows=512 puts exactly 2^16
    elements in a block; all-equal keys drive one 16-bit field to 2^16
    (the wrap edge argued safe in `radix.py _reorder_kernel`)."""
    for digit in (0, 1, 2, 3):
        k = jnp.full((65536,), digit, jnp.uint32)
        out, _ = radix.sort_u32(k, bit_count=4, block_rows=512)
        assert (np.asarray(out) == digit).all()


def test_radix_sort_float32(rng):
    f = (rng.random(3000, dtype=np.float32) * 50).astype(np.float32)
    got = trs.sort(jnp.asarray(f), method="radix", bit_count=16, block_rows=16)
    np.testing.assert_array_equal(np.asarray(got), golden_sort(f, bit_count=16))
