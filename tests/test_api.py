"""Kernel-class API surface (reference export parity, `src/index.ts:1-3`)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_sort


def test_exports():
    # the reference exports exactly these three kernels; we alias them
    assert trs.RadixSortBufferKernel is trs.RadixSortKernel
    assert trs.RadixSortTextureKernel is trs.RadixSortPackedKernel
    assert trs.PrefixSumKernel is not None


def test_radix_sort_kernel_keys_only(rng):
    n = 3000
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    kern = trs.RadixSortKernel(count=n)
    out = np.asarray(kern.dispatch(jnp.asarray(k)))
    assert np.array_equal(out, golden_sort(k))


def test_radix_sort_kernel_with_values(rng):
    n = 3000
    k = rng.integers(0, 100, n, dtype=np.uint64).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    kern = trs.RadixSortKernel(count=n, has_values=True, bit_count=16)
    ok, ov = kern.dispatch(jnp.asarray(k), jnp.asarray(v))
    rk, rv = golden_sort(k, v, bit_count=16)
    assert np.array_equal(np.asarray(ok), rk)
    assert np.array_equal(np.asarray(ov), rv)


def test_kernel_reuse_is_cached(rng):
    n = 1000
    kern = trs.RadixSortKernel(count=n)
    for _ in range(3):
        k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        out = np.asarray(kern.dispatch(jnp.asarray(k)))
        assert np.array_equal(out, golden_sort(k))
    # one compiled pipeline chain per configuration (reference idiom 1)
    assert kern._fn._cache_size() == 1


def test_kernel_subcount_buffer(rng):
    # kernel sorts the first `count` of a larger buffer
    n, count = 2000, 1500
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    kern = trs.RadixSortKernel(count=count)
    out = np.asarray(kern.dispatch(jnp.asarray(k)))
    assert np.array_equal(out, golden_sort(k, count=count))


def test_kernel_value_mismatch_raises():
    kern = trs.RadixSortKernel(count=8)
    with pytest.raises(ValueError):
        kern.dispatch(jnp.zeros(8, jnp.uint32), jnp.zeros(8, jnp.uint32))
    kern2 = trs.RadixSortKernel(count=8, has_values=True)
    with pytest.raises(ValueError):
        kern2.dispatch(jnp.zeros(8, jnp.uint32))


def test_legacy_flags_accepted():
    # reference options exist but are perf-neutral no-ops there too
    trs.RadixSortKernel(count=8, local_shuffle=True, avoid_bank_conflicts=True)
    trs.PrefixSumKernel(count=8, avoid_bank_conflicts=True)


def test_packed_kernel(rng):
    h, w = 16, 128
    k = rng.integers(0, 1000, h * w, dtype=np.uint64).astype(np.uint32)
    v = np.arange(h * w, dtype=np.uint32)
    packed = jnp.asarray(np.stack([k, v], axis=-1).reshape(h, w, 2))
    kern = trs.RadixSortPackedKernel(count=h * w)
    out = np.asarray(kern.dispatch(packed)).reshape(-1, 2)
    rk, rv = golden_sort(k, v)
    assert np.array_equal(out[:, 0], rk)
    assert np.array_equal(out[:, 1], rv)


def test_kernel_aot_compile(rng):
    """compile() ahead-of-time lowers + compiles one executable per buffer
    length (the reference's eager-pipeline-compilation idiom taken all the
    way to an AOT executable), and the executable produces golden output."""
    n, buf = 1000, 1500
    k = rng.integers(0, 2**32, buf, dtype=np.uint64).astype(np.uint32)
    kern = trs.RadixSortKernel(count=n)
    exe = kern.compile(buffer_len=buf)
    out = np.asarray(exe(jnp.asarray(k)))
    assert np.array_equal(out, golden_sort(k, count=n))
    # default buffer length = count
    kern2 = trs.RadixSortKernel(count=n, has_values=True)
    exe2 = kern2.compile()
    kk = k[:n]
    vv = np.arange(n, dtype=np.uint32)
    ok, ov = exe2(jnp.asarray(kk), jnp.asarray(vv))
    rk, rv = golden_sort(kk, vv)
    assert np.array_equal(np.asarray(ok), rk)
    assert np.array_equal(np.asarray(ov), rv)


def test_check_order_kernel(rng):
    n = 4096
    k = np.sort(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    kern = trs.RadixSortKernel(count=n, check_order=True)
    out = np.asarray(kern.dispatch(jnp.asarray(k)))
    assert np.array_equal(out, k)


def test_kernel_class_mesh(rng):
    """`RadixSortKernel(mesh=)`: one constructed instance is a distributed
    pipeline (construct-once/dispatch-many over a Mesh axis), AOT compile
    included — the sharded-aval analogue of the reference's eager pipeline
    build (`AbstractRadixSortKernel.ts:80-108`)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices("cpu")[:8]
    mesh = Mesh(np.array(devs), ("x",))
    n = 4096
    kern = trs.RadixSortKernel(count=n, has_values=True, mesh=mesh)
    keys = rng.integers(0, 2**10, size=n, dtype=np.uint32)
    values = np.arange(n, dtype=np.uint32)
    sh = NamedSharding(mesh, P("x"))
    gk, gv = kern.dispatch(
        jax.device_put(jnp.asarray(keys), sh),
        jax.device_put(jnp.asarray(values), sh),
    )
    rk, rv = golden_sort(keys, values)
    np.testing.assert_array_equal(np.asarray(gk), rk)
    np.testing.assert_array_equal(np.asarray(gv), rv)

    exe = trs.RadixSortKernel(count=n, mesh=mesh).compile()
    out = exe(jax.device_put(jnp.asarray(keys), sh))
    np.testing.assert_array_equal(np.asarray(out), golden_sort(keys))
