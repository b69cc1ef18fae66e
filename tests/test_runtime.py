"""Runtime layer: native CPU baseline sorter + bindings."""
import numpy as np

from tpu_radix_sort.runtime.cpu_baseline import (
    cpu_disorder_count,
    cpu_sort,
    native_available,
)


def test_native_cpu_sort_matches_numpy(rng):
    k = rng.integers(0, 2**32, 100_000, dtype=np.uint64).astype(np.uint32)
    v = np.arange(k.size, dtype=np.uint32)
    sk, sv = cpu_sort(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(sk, k[order])
    np.testing.assert_array_equal(sv, v[order])
    np.testing.assert_array_equal(cpu_sort(k), k[order])


def test_native_disorder_count(rng):
    k = rng.integers(0, 2**16, 10_000, dtype=np.uint64).astype(np.uint32)
    expect = int(np.sum(k[:-1] > k[1:]))
    assert cpu_disorder_count(k) == expect
    assert cpu_disorder_count(np.sort(k)) == 0
    assert cpu_disorder_count(np.array([7], dtype=np.uint32)) == 0


def test_native_build_available():
    # g++ is baked into this image; the binding must actually build.
    assert native_available()
