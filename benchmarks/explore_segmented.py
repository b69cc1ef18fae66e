"""Price the hypothetical row-local fast path for near-equal segments
(round-4 VERDICT item 3 / weak #2).

`sort_segments` always runs the composite (seg_id, key) network over the
full array — O(log^2 n_total) stages — while equal-length segments could
in principle take `sort_batched`'s row-local network (O(log^2 row)). The
blocker: `offsets` is a TRACED operand, so a row-local path must first
GATHER the ragged data into padded rows (padded[i, j] = flat[offsets[i]+j])
and scatter it back — two data-dependent-index passes over n elements,
exactly the access pattern DESIGN.md measured element-serial (~2 GB/s) on
TPU. This probe measures, on chip at 16M keys / 1024 near-equal segments:

  1. the composite segmented sort (what ships),
  2. sort_batched on the same data already IN row layout (the bound any
     row-local path could hope for),
  3. the gather-pad -> row-local sort -> scatter-back roundtrip (the
     actual fast-path candidate, offsets traced).

If (3) >= (1), the fast path is a measured dead end and the composite
stays the only engine; verdict goes to DESIGN.md's formulation matrix.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpu_radix_sort as trs
from tpu_radix_sort.runtime import device_time


def bench(name, fn, x, n, check=None):
    try:
        f = jax.jit(fn)
        out = f(x)
        ok = True if check is None else check(
            [np.asarray(l) for l in jax.tree_util.tree_leaves(out)])
        t = device_time(f, x, k_lo=1, k_hi=3)
        print(f"{name:52s} {t*1e3:9.3f} ms  {n/t/1e9:7.3f} Gkeys/s  ok={ok}",
              flush=True)
        return t
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    n = 1 << 24
    S, L = 1024, (1 << 24) // 1024
    # near-equal ragged segments: L +- 12% (pow2-pad waste < 33%), zero-sum
    # jitter so the correction can't drive any segment negative
    delta = rng.integers(-L // 8, L // 8, S).astype(np.int64)
    delta -= delta.sum() // S
    rem = int(delta.sum())
    delta[: abs(rem)] -= np.sign(rem)
    sizes = np.full(S, L, np.int64) + delta
    assert sizes.min() > 0 and sizes.sum() == n
    offs_np = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    seg_ids = np.repeat(np.arange(S), sizes)
    ref = k[np.lexsort((k, seg_ids))]
    offs = jnp.asarray(offs_np)
    kj = jnp.asarray(k)

    bench("16M/1024 near-equal segmented (composite, ships)",
          lambda a: trs.sort_segments(a, offs), kj, n,
          check=lambda ls: np.array_equal(ls[0], ref))

    # bound: the same keys already laid out as equal rows
    keq = jnp.asarray(k[: S * (n // S)].reshape(S, n // S))
    bench("16M 1024x16K already-rows (row-local bound)",
          lambda a: trs.sort_batched(a), keq, S * (n // S))

    P = 1 << int(np.ceil(np.log2(sizes.max())))  # common pow2 row pad

    def rowlocal_roundtrip(a):
        # gather-pad: padded[i, j] = a[offsets[i] + j], masked past len_i
        lens = offs[1:] - offs[:-1]
        j = jnp.arange(P, dtype=jnp.int32)
        src = offs[:-1, None] + j[None, :]
        valid = j[None, :] < lens[:, None]
        padded = jnp.where(
            valid, a[jnp.clip(src, 0, n - 1)], jnp.uint32(0xFFFFFFFF))
        srt = trs.sort_batched(padded)
        # scatter-back: out[offsets[i] + r] = srt[i, r] for r < len_i
        flat_pos = jnp.where(valid, src, n).reshape(-1)
        return jnp.zeros((n + 1,), jnp.uint32).at[flat_pos].set(
            srt.reshape(-1))[:n]

    bench("16M/1024 gather-pad + row-local + scatter-back",
          rowlocal_roundtrip, kj, n,
          check=lambda ls: np.array_equal(ls[0], ref))

    # isolate the data movement: the two index passes alone
    def movement_only(a):
        lens = offs[1:] - offs[:-1]
        j = jnp.arange(P, dtype=jnp.int32)
        src = offs[:-1, None] + j[None, :]
        valid = j[None, :] < lens[:, None]
        padded = jnp.where(
            valid, a[jnp.clip(src, 0, n - 1)], jnp.uint32(0xFFFFFFFF))
        flat_pos = jnp.where(valid, src, n).reshape(-1)
        return jnp.zeros((n + 1,), jnp.uint32).at[flat_pos].set(
            padded.reshape(-1))[:n]

    bench("16M/1024 gather-pad + scatter-back alone",
          movement_only, kj, n,
          check=lambda ls: np.array_equal(ls[0], k))


if __name__ == "__main__":
    main()
