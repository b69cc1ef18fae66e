"""Prefix-sum op vs the golden oracle — mirrors the reference's
test_prefix_sum sweep (`example/tests.ts:110-182`): sizes 1..10^5 with
jitter, values in [0, 8), exclusive scan oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_prefix_sum


@pytest.mark.parametrize(
    "n", [1, 2, 7, 127, 128, 129, 1000, 4096, 12345, 100_000]
)
def test_prefix_sum_matches_oracle(rng, n):
    x = rng.integers(0, 8, n).astype(np.uint32)
    out = np.asarray(trs.prefix_sum(jnp.asarray(x)))
    assert np.array_equal(out, golden_prefix_sum(x))


def test_prefix_sum_subcount_preserves_suffix(rng):
    x = rng.integers(0, 8, 1000).astype(np.uint32)
    out = np.asarray(trs.prefix_sum(jnp.asarray(x), count=600))
    ref = golden_prefix_sum(x, count=600)
    assert np.array_equal(out, ref)
    assert np.array_equal(out[600:], x[600:])


def test_prefix_sum_u32_wraparound():
    x = np.array([0xFFFFFFFF, 0xFFFFFFFF, 5, 7], dtype=np.uint32)
    out = np.asarray(trs.prefix_sum(jnp.asarray(x)))
    assert np.array_equal(out, golden_prefix_sum(x))


def test_prefix_sum_inclusive(rng):
    x = rng.integers(0, 100, 777).astype(np.uint32)
    out = np.asarray(trs.prefix_sum(jnp.asarray(x), inclusive=True))
    ref = np.cumsum(x.astype(np.uint64)).astype(np.uint32)
    assert np.array_equal(out, ref)


def test_prefix_sum_multiblock(rng):
    # force several grid steps to exercise the carry chain
    x = rng.integers(0, 8, 200_000).astype(np.uint32)
    out = np.asarray(trs.prefix_sum(jnp.asarray(x), block_rows=128))
    assert np.array_equal(out, golden_prefix_sum(x))


@pytest.mark.parametrize("block_rows", [2, 8, 32, 256, 1024])
def test_prefix_sum_block_rows_sweep(rng, block_rows):
    """Tile-shape sweep for the scan — the reference sweeps workgroup sizes
    for its PrefixSumKernel too (`example/tests.ts:117-126`); the output
    must be invariant to the tiling knob. Sizes hit exact-multiple,
    sub-tile, and ragged-tail cases per block size."""
    for n in (257, 4096, 33000):
        x = rng.integers(0, 8, n).astype(np.uint32)
        out = np.asarray(trs.prefix_sum(jnp.asarray(x), block_rows=block_rows))
        assert np.array_equal(out, golden_prefix_sum(x)), (block_rows, n)
        kern = trs.PrefixSumKernel(count=n, block_rows=block_rows)
        assert np.array_equal(np.asarray(kern.dispatch(jnp.asarray(x))),
                              golden_prefix_sum(x)), (block_rows, n)


def test_prefix_sum_kernel_class(rng):
    x = rng.integers(0, 8, 5000).astype(np.uint32)
    kern = trs.PrefixSumKernel(count=5000)
    out = np.asarray(kern.dispatch(jnp.asarray(x)))
    assert np.array_equal(out, golden_prefix_sum(x))


def test_prefix_sum_rejects_bad_input():
    with pytest.raises(TypeError):
        trs.prefix_sum(jnp.zeros(8, jnp.float32))
    with pytest.raises(ValueError):
        trs.prefix_sum(jnp.zeros((2, 2), jnp.uint32))
    with pytest.raises(ValueError):
        trs.prefix_sum(jnp.zeros(8, jnp.uint32), count=9)
