"""Reference-breadth randomized configuration sweep (`-m slow`).

The reference integrity test draws *hundreds* of random configurations:
every workgroup shape (x,y) in {2..256}^2, element counts 10^2..10^7 with
+-10% jitter, a random sub-count, and fresh random flag draws each time
(`/root/reference/example/tests.ts:19-42`). This file is that matrix for
the TPU build: a few hundred drawn configs over tile shape (block_rows —
our workgroup-size analogue), count decades, sub-counts, flags, dtypes and
engines, each checked byte-exactly against the golden model.

Interpret-mode compile cost bounds the decades at 10^2..10^5 (the 10^6+
region runs on real hardware in benchmarks/); `jax.clear_caches()` brackets
the sweep in chunks because hundreds of fresh XLA:CPU pipelines in one
process end in the native segfault documented in conftest.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_sort

pytestmark = pytest.mark.slow

BLOCK_ROWS_CHOICES = [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
CLEAR_EVERY = 10  # compiled-executable accumulation guard (conftest.py)


def _draw_keys(rng, n, dtype):
    if dtype == "uint32":
        return rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    if dtype == "float32":
        return (rng.random(n) * 1e6).astype(np.float32)  # non-negative
    if dtype == "int32":
        return rng.integers(0, 2**31, n, dtype=np.int64).astype(np.int32)
    raise ValueError(dtype)


def _draw_count(rng):
    exp = int(rng.integers(2, 6))  # decades 10^2..10^5
    return max(2, int(10**exp * (0.9 + 0.2 * rng.random())))  # +-10% jitter


def _oracle(k, v, *, count, bit_count, descending, total_order):
    if not total_order:
        return golden_sort(k, v, count=count, bit_count=bit_count,
                           descending=descending)
    # true numeric order (beyond-reference extension; bit_count == 32 only)
    key = -k[:count] if descending else k[:count]
    order = np.argsort(key, kind="stable")
    rk, rv = k.copy(), (None if v is None else v.copy())
    rk[:count] = k[:count][order]
    if v is None:
        return rk
    rv[:count] = v[:count][order]
    return rk, rv


def _run_config(rng, i, method):
    n = _draw_count(rng)
    count = n if rng.random() < 0.5 else int(rng.integers(0, n + 1))
    block_rows = int(rng.choice(BLOCK_ROWS_CHOICES))
    bit_count = 32 if rng.random() < 0.6 else int(rng.choice(
        [4, 8, 12, 16, 20, 24, 28]))
    dtype = str(rng.choice(["uint32", "uint32", "float32", "int32"]))
    check_order = rng.random() < 0.25
    descending = rng.random() < 0.15
    total_order = bit_count == 32 and rng.random() < 0.15
    with_values = rng.random() < 0.5
    presorted = rng.random() < 0.15  # exercise the early-exit path too

    k = _draw_keys(rng, n, dtype)
    if presorted:
        k = golden_sort(k)
    kwargs = dict(count=count, bit_count=bit_count, check_order=check_order,
                  descending=descending, total_order=total_order,
                  method=method, block_rows=block_rows)
    cfg = (i, method, n, count, block_rows, bit_count, dtype, check_order,
           descending, total_order, with_values)
    if with_values:
        if rng.random() < 0.5:
            v = np.arange(n, dtype=np.uint32)  # the reference's payload
            ranks = rng.random() < 0.5  # iota satisfies the rank contract
        else:
            v = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
            ranks = False
        ok, ov = trs.sort(jnp.asarray(k), jnp.asarray(v),
                          values_are_ranks=ranks, **kwargs)
        rk, rv = _oracle(k, v, count=count, bit_count=bit_count,
                         descending=descending, total_order=total_order)
        np.testing.assert_array_equal(np.asarray(ok), rk, err_msg=str(cfg))
        np.testing.assert_array_equal(np.asarray(ov), rv, err_msg=str(cfg))
    else:
        out = trs.sort(jnp.asarray(k), **kwargs)
        ref = _oracle(k, None, count=count, bit_count=bit_count,
                      descending=descending, total_order=total_order)
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=str(cfg))


def test_bitonic_breadth_sweep():
    rng = np.random.default_rng(20260817)
    for i in range(200):
        if i % CLEAR_EVERY == 0:
            jax.clear_caches()
        _run_config(rng, i, "bitonic")
    jax.clear_caches()


def test_bitonic_folded_fast_path_sweep(monkeypatch):
    """The randomized matrix with BOTH folded fast paths forced on
    (USE_FOLD2_CE / USE_FOLD3_CE, ops/bitonic.py): every drawn config must
    stay byte-exact whichever way the on-chip A/B decides the defaults."""
    from tpu_radix_sort.ops import bitonic

    monkeypatch.setattr(bitonic, "USE_FOLD2_CE", True)
    monkeypatch.setattr(bitonic, "USE_FOLD3_CE", True)
    rng = np.random.default_rng(20260821)
    for i in range(40):
        if i % CLEAR_EVERY == 0:
            jax.clear_caches()
        _run_config(rng, i, "bitonic")
    jax.clear_caches()


def test_xla_engine_breadth_sweep():
    rng = np.random.default_rng(20260818)
    for i in range(30):
        if i % CLEAR_EVERY == 0:
            jax.clear_caches()
        _run_config(rng, i, "xla")
    jax.clear_caches()


def test_radix_breadth_sweep_through_kernel_class():
    """Radix engine driven through the reference-shaped kernel-class API
    (`RadixSortKernel(method='radix')` — round-2 VERDICT: the class path
    never carried radix in any test). Counts stay small: the interpret-mode
    radix pipeline pays 16 emulated passes per sort."""
    rng = np.random.default_rng(20260819)
    for i in range(24):
        if i % 6 == 0:
            jax.clear_caches()
        n = int(rng.integers(100, 1500))
        count = n if rng.random() < 0.5 else int(rng.integers(0, n + 1))
        bit_count = int(rng.choice([4, 8, 16, 32]))
        check_order = rng.random() < 0.3
        with_values = rng.random() < 0.5
        # full tiling axis incl. oversized blocks (> 2^16 elements/block
        # once padded) — the packed-cumsum overflow regression surface;
        # digit-skewed draws make a single digit run exceed 2^16 there
        block_rows = int(rng.choice([8, 16, 64, 256, 512, 1024]))
        digit_skew = rng.random() < 0.3
        k = _draw_keys(rng, n, "uint32")
        if digit_skew:
            k = (k & np.uint32(3)).astype(np.uint32)
        kern = trs.RadixSortKernel(
            count=count, has_values=with_values, bit_count=bit_count,
            check_order=check_order, method="radix", block_rows=block_rows,
        )
        cfg = (i, n, count, bit_count, check_order, with_values, block_rows)
        if with_values:
            v = np.arange(n, dtype=np.uint32)
            ok, ov = kern.dispatch(jnp.asarray(k), jnp.asarray(v))
            rk, rv = golden_sort(k, v, count=count, bit_count=bit_count)
            np.testing.assert_array_equal(np.asarray(ok), rk, err_msg=str(cfg))
            np.testing.assert_array_equal(np.asarray(ov), rv, err_msg=str(cfg))
        else:
            out = kern.dispatch(jnp.asarray(k))
            ref = golden_sort(k, count=count, bit_count=bit_count)
            np.testing.assert_array_equal(np.asarray(out), ref,
                                          err_msg=str(cfg))
    jax.clear_caches()
