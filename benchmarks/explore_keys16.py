"""On-chip A/B for 16-bit keys-only sort candidates (round-4 VERDICT #6).

16-bit keys have a 2^16-point value domain, which opens strategies the
32-bit sort can't use. Candidates, all golden-checked in-run at 16M keys:

1. **bitonic widened** (the default path): u16 pattern in a u32 lane
   through the comparison network — same cost as a u32 sort (the network
   is data-oblivious), so this is the baseline to beat.
2. **radix bit_count=16**: the 4-way LSD compat engine at half the passes
   (8 instead of 16) — automatic once bit_count follows the native width.
3. **counting sort** (keys-only only — a multiset needs no permutation):
   65536-bin histogram + exclusive scan + order-free EMISSION. Histogram
   via XLA scatter-add; emission via a 65536-element scatter of run starts
   + one cummax (`lax.associative_scan(maximum)`) — O(n) HBM traffic with
   no network, the speed-of-light shape for this problem IF the scatter
   and scan primitives cooperate on TPU.
4. **one-hot matmul histogram** variant of 3: hist[hi8, lo8] counted by a
   (256 x n_blk) @ (n_blk x 256) f32 matmul per block (exact for counts
   < 2^24) — routes the histogram through the MXU instead of a scatter.

Results + verdict recorded in DESIGN.md / BENCH.md.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpu_radix_sort as trs
from tpu_radix_sort.runtime import device_time


def counting_sort_u16(k16):
    """Keys-only counting sort: hist (scatter-add) -> excl. scan -> emit
    (scatter run starts + cummax). Returns sorted u16."""
    n = k16.shape[0]
    k = k16.astype(jnp.int32)
    hist = jnp.zeros((1 << 16,), jnp.int32).at[k].add(1)
    csum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
    # place (v+1) at each nonempty run's start; empty runs scatter to a
    # dropped overflow slot; cummax fills the runs; -1 recovers the value
    v = jnp.arange(1 << 16, dtype=jnp.int32)
    pos = jnp.where(hist > 0, csum, n)
    starts = jnp.zeros((n + 1,), jnp.int32).at[pos].max(v + 1)[:n]
    out = jax.lax.associative_scan(jnp.maximum, starts) - 1
    return out.astype(jnp.uint16)


def matmul_hist_u16(k16, blk=1 << 19):
    """65536-bin histogram via per-block one-hot f32 matmuls on the MXU:
    hist[hi, lo] = sum_i [hi8(x_i)=hi][lo8(x_i)=lo]."""
    n = k16.shape[0]
    assert n % blk == 0
    k = k16.astype(jnp.int32).reshape(n // blk, blk)
    ids = jnp.arange(256, dtype=jnp.int32)

    def body(acc, kb):
        hi = (kb >> 8)[:, None] == ids[None, :]   # (blk, 256)
        lo = (kb & 255)[:, None] == ids[None, :]  # (blk, 256)
        h = jnp.dot(hi.astype(jnp.float32).T, lo.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        return acc + h.astype(jnp.int32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((256, 256), jnp.int32), k)
    return acc.reshape(1 << 16)


def counting_sort_u16_matmul(k16):
    n = k16.shape[0]
    hist = matmul_hist_u16(k16)
    csum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
    v = jnp.arange(1 << 16, dtype=jnp.int32)
    pos = jnp.where(hist > 0, csum, n)
    starts = jnp.zeros((n + 1,), jnp.int32).at[pos].max(v + 1)[:n]
    out = jax.lax.associative_scan(jnp.maximum, starts) - 1
    return out.astype(jnp.uint16)


def bench(name, fn, x, n, ref):
    try:
        f = jax.jit(fn)
        out = np.asarray(f(x))
        ok = np.array_equal(out.view(np.uint16), ref.view(np.uint16))
        t = device_time(f, x, k_lo=1, k_hi=3)
        print(f"{name:44s} {t*1e3:9.3f} ms  {n/t/1e9:7.3f} Gkeys/s  ok={ok}",
              flush=True)
        return t
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    n = 1 << 24
    k = rng.integers(0, 2**16, n).astype(np.uint16)
    ref = np.sort(k)
    kj = jnp.asarray(k)

    bench("16M u16 bitonic widened (default)",
          lambda a: trs.sort(a), kj, n, ref)
    bench("16M u16 radix bit_count=16 (8 passes)",
          lambda a: trs.sort(a, method="radix"), kj, n, ref)
    bench("16M u16 counting (scatter hist + cummax)",
          counting_sort_u16, kj, n, ref)
    bench("16M u16 counting (matmul hist + cummax)",
          counting_sort_u16_matmul, kj, n, ref)
    # reference point: XLA's own sort on the widened keys
    bench("16M u16 lax.sort (XLA baseline)",
          lambda a: trs.sort(a, method="xla"), kj, n, ref)

    # skewed distribution: counting sort is distribution-oblivious, the
    # scatter-add histogram may not be (hot-bin contention)
    kz = np.minimum(rng.zipf(1.3, n), 2**16 - 1).astype(np.uint16)
    refz = np.sort(kz)
    bench("16M u16 Zipf counting (scatter hist)",
          counting_sort_u16, jnp.asarray(kz), n, refz)
    bench("16M u16 Zipf bitonic widened",
          lambda a: trs.sort(a), jnp.asarray(kz), n, refz)


if __name__ == "__main__":
    main()
