"""TPU-vs-CPU crossover: where does the chip beat the host?

The reference's headline qualitative claim is "the GPU sort beats the CPU
above ~100,000 elements" (`/root/reference/README.md:16`), measured against
the host's `Array.prototype.sort` (`example/index.ts:147-151`). This is that
experiment for the TPU build: the default engine vs the native C++ LSD radix
sorter (`runtime/native/sort.cc`, the strongest host baseline here — it
beats NumPy's stable sort several-fold) across element-count decades.

TPU timing uses the slope method; chain lengths auto-escalate inside
`device_time` (a 60 us op needs hundreds of chained iterations to climb out
of the ~25-30 ms fetch noise of the tunneled device — CLAUDE.md). CPU timing
is plain perf_counter medians (no tunnel in that path).

Run on the real chip: python benchmarks/crossover.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tpu_radix_sort as trs
from tpu_radix_sort.runtime import device_time
from tpu_radix_sort.runtime.cpu_baseline import cpu_sort, native_available


def cpu_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def oneshot_time(f, x, reps=5):
    """Host-observed wall time of ONE dispatch + result fetch (compile
    cached). Over the axon tunnel this includes the fixed ~25-30 ms host
    sync, so it is an upper bound on what a non-tunneled deployment would
    see — the honest 'cold pipeline' column next to the slope method's
    resident-pipeline number (round-4 VERDICT weak item 6)."""
    out = f(x)                       # compile + warm
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(7)
    print(f"native CPU baseline available: {native_available()}")
    print(f"{'n':>10} | {'TPU keys':>10} {'1-shot':>10} {'CPU keys':>10} "
          f"{'win':>6} | {'TPU k+v':>10} {'CPU k+v':>10} {'win':>6}")
    for e in range(10, 25, 2):
        n = 1 << e
        keys = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        kj, vj = jnp.asarray(keys), jnp.asarray(vals)

        f_k = jax.jit(lambda a: trs.sort(a))
        t_tpu_k = device_time(f_k, kj)
        t_one_k = oneshot_time(f_k, kj)
        t_tpu_kv = device_time(
            lambda kv: tuple(trs.sort(kv[0], kv[1], values_are_ranks=True)),
            (kj, vj))
        t_cpu_k = cpu_time(lambda: cpu_sort(keys))
        t_cpu_kv = cpu_time(lambda: cpu_sort(keys, vals))

        def fmt(t):
            return f"{t*1e6:9.1f}u" if t < 1e-3 else f"{t*1e3:9.2f}m"

        print(f"2^{e:<8} | {fmt(t_tpu_k)} {fmt(t_one_k)} {fmt(t_cpu_k)} "
              f"{t_cpu_k / t_tpu_k:5.1f}x | {fmt(t_tpu_kv)} {fmt(t_cpu_kv)} "
              f"{t_cpu_kv / t_tpu_kv:5.1f}x")


if __name__ == "__main__":
    main()
