"""On-chip component measurements for the radix-vs-bitonic question.

VERDICT.md round 1 asked for a *measured* (not estimated) answer to whether
an MSD-bucket + batched-block-sort hybrid can beat the bitonic engine
(DESIGN.md's dismissal priced per-bit log-shift compaction only). This
script measures the primitives every candidate construction is built from:

  1. batched `lax.sort` rates by row length and operand count (the only
     fast local-reorder primitive XLA exposes),
  2. the compat radix engine's per-pass cost (histogram + 4-way compaction
     + window DMAs),
  3. the bitonic engine's reference times at the same sizes.

Run alone (one chip, sequential probes): python benchmarks/explore_msd.py
"""
import functools
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_radix_sort.runtime.timing import device_time


def bench(tag, fn, *args, k_lo=2, k_hi=12):
    t = device_time(fn, *args, k_lo=k_lo, k_hi=k_hi)
    n = args[0].size if hasattr(args[0], "size") else np.prod(args[0][0].shape)
    print(f"{tag:58s} {t*1e3:9.3f} ms   {n/t/1e9:7.2f} Gelem/s", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    N = 1 << 24  # 16M

    print("== batched lax.sort rate by row length (16M u32, 1 operand) ==")
    for L in (512, 2048, 8192, 65536):
        C = N // L
        x = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)).reshape(C, L)
        f = jax.jit(lambda a: jax.lax.sort(a, dimension=1))
        bench(f"sort [{C}x{L}] 1-op", f, x)

    print("== operand count / stability (16M, rows 2048) ==")
    C, L = N // 2048, 2048
    k = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)).reshape(C, L)
    v = jnp.asarray(np.arange(N, dtype=np.uint32)).reshape(C, L)
    w = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)).reshape(C, L)
    f2u = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1, is_stable=False))
    f2s = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1, is_stable=True))
    f3s = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=1, num_keys=1, is_stable=True))
    bench("sort [8192x2048] 2-op 1-key unstable", lambda ab: f2u(*ab), (k, v))
    bench("sort [8192x2048] 2-op 1-key stable", lambda ab: f2s(*ab), (k, v))
    bench("sort [8192x2048] 3-op 1-key stable", lambda abc: f3s(*abc), (k, v, w))

    print("== compat radix engine per-pass (16M keys-only, 2 passes) ==")
    from tpu_radix_sort.ops import radix

    u = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    f4 = jax.jit(functools.partial(radix.sort_u32, bit_count=4, interpret=False))
    t = bench("radix bit_count=4 (2 passes: hist+scan+compact+window)",
              lambda a: f4(a)[0], u, k_lo=1, k_hi=5)
    print(f"   -> per 2-bit pass: {t/2*1e3:.3f} ms")

    print("== bitonic reference points (16M) ==")
    import tpu_radix_sort as trs

    fb1 = jax.jit(functools.partial(trs.sort, method="bitonic", interpret=False))
    bench("bitonic 16M keys-only", fb1, u)

    print("== padded-row overhead: sort [8192x2048] vs [8192x2560] ==")
    xpad = jnp.concatenate(
        [k, jnp.full((C, 512), 0xFFFFFFFF, jnp.uint32)], axis=1
    )
    fpad = jax.jit(lambda a: jax.lax.sort(a, dimension=1))
    bench("sort [8192x2560] 1-op (1.25x sentinel pad)", fpad, xpad)


if __name__ == "__main__":
    main()
