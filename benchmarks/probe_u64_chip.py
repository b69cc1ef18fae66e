"""On-chip probe for the x64 roll-shift fix (2026-08-19).

The first r5 workloads capture found every u64 row failing Mosaic
verification on real TPU: under jax_enable_x64 a Python-int pltpu.roll
shift binds as an i64 scalar and `tpu.dynamic_rotate` requires i32
(interpret mode skips the verifier, so the unit suite never saw it).
This re-runs exactly the failing rows after `common.roll_shift_i32`
pinned every shift; promoted rows live in workloads.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpu_radix_sort as trs
from tpu_radix_sort.runtime import device_time


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    jax.config.update("jax_enable_x64", True)
    try:
        n = 1 << 24
        k64np = rng.integers(0, 2**64, n, dtype=np.uint64)
        k64 = jnp.asarray(k64np)
        ref64 = np.sort(k64np)

        f = jax.jit(lambda a: trs.sort(a))
        out = np.asarray(f(k64))
        ok = np.array_equal(out, ref64)
        t = device_time(f, k64, k_lo=1, k_hi=3)
        print(f"16M u64 keys-only      {t*1e3:9.3f} ms  ok={ok}", flush=True)

        v64 = jnp.arange(n, dtype=jnp.uint32)
        order64 = np.argsort(k64np, kind="stable").astype(np.uint32)
        fkv = jax.jit(
            lambda kv: tuple(trs.sort(kv[0], kv[1], values_are_ranks=True)))
        ok2, ov2 = fkv((k64, v64))
        ok_kv = (np.array_equal(np.asarray(ok2), ref64)
                 and np.array_equal(np.asarray(ov2), order64))
        t = device_time(fkv, (k64, v64), k_lo=1, k_hi=3)
        print(f"16M u64 key+value      {t*1e3:9.3f} ms  ok={ok_kv}",
              flush=True)

        # is_sorted on u64 goes through the 2-column checksort kernel,
        # whose rolls were equally i64-poisoned under x64
        fs = jax.jit(lambda a: trs.is_sorted(a))
        srt = jnp.asarray(ref64)
        print(f"16M u64 is_sorted(sorted)   -> {bool(fs(srt))} "
              f"(want True)", flush=True)
        print(f"16M u64 is_sorted(unsorted) -> {bool(fs(k64))} "
              f"(want False)", flush=True)
        del k64, ref64, v64, order64, k64np

        # u32 keys + u64 (hi,lo) payload
        kv_np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        vv_np = rng.integers(0, 2**64, n, dtype=np.uint64)
        ordv = np.argsort(kv_np, kind="stable")
        rkv, rvv = kv_np[ordv], vv_np[ordv]
        fp = jax.jit(lambda kv: tuple(trs.sort(kv[0], kv[1])))
        okk, ovv = fp((jnp.asarray(kv_np), jnp.asarray(vv_np)))
        ok_p = (np.array_equal(np.asarray(okk), rkv)
                and np.array_equal(np.asarray(ovv), rvv))
        t = device_time(fp, (jnp.asarray(kv_np), jnp.asarray(vv_np)),
                        k_lo=1, k_hi=3)
        print(f"16M u32k + u64v        {t*1e3:9.3f} ms  ok={ok_p}",
              flush=True)
    finally:
        jax.config.update("jax_enable_x64", False)
        jax.clear_caches()


if __name__ == "__main__":
    main()
