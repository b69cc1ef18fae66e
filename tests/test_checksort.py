"""Order-check reduction (reference: CheckSort kernel family)."""
import jax
import jax.numpy as jnp
import numpy as np

import tpu_radix_sort as trs
from tpu_radix_sort.ops import checksort


def test_disorder_count(rng):
    u = jnp.asarray(np.array([1, 2, 2, 1, 5, 4], dtype=np.uint32))
    assert int(checksort.disorder_count(u)) == 2
    assert int(checksort.disorder_count(jnp.asarray(np.array([7], dtype=np.uint32)))) == 0


def test_is_sorted_small(rng):
    assert bool(checksort.is_sorted(jnp.arange(10, dtype=jnp.uint32)))
    assert not bool(checksort.is_sorted(jnp.asarray(np.array([2, 1], dtype=np.uint32))))


def test_is_sorted_fast_gate(rng):
    # disorder past the fast window must still be detected by the full check
    n = checksort.FAST_CHECK_ELEMENTS * 4
    a = np.arange(n, dtype=np.uint32)
    assert bool(checksort.is_sorted(jnp.asarray(a)))
    a[n - 2], a[n - 1] = a[n - 1], a[n - 2]
    assert not bool(checksort.is_sorted(jnp.asarray(a)))
    # disorder exactly at the fast/full boundary (the reference overlaps the
    # boundary pair by starting the full check one element early)
    b = np.arange(n, dtype=np.uint32)
    f = checksort.FAST_CHECK_ELEMENTS
    b[f - 1], b[f] = b[f], b[f - 1]
    assert not bool(checksort.is_sorted(jnp.asarray(b)))


def test_public_is_sorted_jits():
    f = jax.jit(lambda x: trs.is_sorted(x))
    assert bool(f(jnp.arange(100, dtype=jnp.uint32)))


def test_disorder_count_pallas_path(rng):
    """Sizes that hit the streaming Pallas reduction, incl. block boundary."""
    for blocks in (1, 2):
        n = checksort.PALLAS_MIN_ELEMENTS * blocks
        u = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        expect = int(np.sum(u[:-1] > u[1:]))
        assert int(checksort.disorder_count(jnp.asarray(u))) == expect
        assert int(checksort.disorder_count(jnp.asarray(np.sort(u)))) == 0
