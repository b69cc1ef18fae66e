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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpu_radix_sort as trs
from tpu_radix_sort.runtime import device_time


def _cummax_shift(x, s, axis):
    rolled = pltpu.roll(x, s, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx >= s, rolled, jnp.int32(0))


def _cummax_kernel(x_ref, o_ref, carry):
    """Streaming inclusive cummax of non-negative i32 (identity 0) — the
    max-scan sibling of ops/scan.py's one-pass streaming add-scan (max has
    no inverse, so the exclusive-row trick becomes a shifted row scan)."""
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[0] = jnp.int32(0)

    x = x_ref[:]
    rows = x.shape[0]
    s = 1
    while s < 128:
        x = jnp.maximum(x, _cummax_shift(x, s, 1))
        s *= 2
    tot = x[:, 127:]  # (rows, 1) per-row inclusive maxes
    prev = _cummax_shift(tot, 1, 0)  # exclusive over rows, step 1
    s = 1
    while s < rows:
        prev = jnp.maximum(prev, _cummax_shift(prev, s, 0))
        s *= 2
    inc = jnp.maximum(x, prev)
    o_ref[:] = jnp.maximum(inc, carry[0])
    carry[0] = jnp.maximum(carry[0], inc[rows - 1, 127])


def cummax_1d(x, block_rows=512):
    """Inclusive running max of a non-negative i32 1-D array (Pallas)."""
    from tpu_radix_sort.ops import common
    n = x.shape[0]
    rows = -(-n // 128)
    rows = -(-rows // block_rows) * block_rows
    xp = jnp.concatenate(
        [x, jnp.zeros((rows * 128 - n,), jnp.int32)]).reshape(rows, 128)
    out = pl.pallas_call(
        _cummax_kernel,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=common.default_interpret(),
    )(xp)
    return out.reshape(rows * 128)[:n]


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
    blk = min(blk, n)
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
    """MXU-histogram counting sort with the Pallas streaming cummax
    emission (associative_scan at 16M is compile-pathological — measured
    2026-08-19; the one-pass kernel replaces it)."""
    n = k16.shape[0]
    hist = matmul_hist_u16(k16)
    csum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
    v = jnp.arange(1 << 16, dtype=jnp.int32)
    pos = jnp.where(hist > 0, csum, n)
    starts = jnp.zeros((n + 1,), jnp.int32).at[pos].max(v + 1)[:n]
    out = cummax_1d(starts) - 1
    return out.astype(jnp.uint16)


def _stage_kernel(x_ref, o_ref, *, reps, dtype):
    """`reps` data-dependent min/max CE-ish stages on one VMEM tile —
    per-stage issue rate probe for 16- vs 32-bit lanes (does Mosaic run
    2-per-lane 16-bit vectors at 2x the u32 element rate?)."""
    x = x_ref[:]
    for r in range(reps):
        p = pltpu.roll(x, 1 + (r & 3), axis=1)
        lo = jnp.minimum(x, p)
        hi = jnp.maximum(x, p)
        x = jnp.where((jax.lax.broadcasted_iota(
            jnp.int32, x.shape, 1) & 1) == 0, lo, hi)
    o_ref[:] = x


def stage_rate(dtype, rows=2048, reps=16):
    """Elements/second through `reps` min/max stages at the given dtype."""
    import functools
    total_rows = 1 << 15
    x = jnp.zeros((total_rows, 128), dtype)
    f = jax.jit(lambda a: pl.pallas_call(
        functools.partial(_stage_kernel, reps=reps, dtype=dtype),
        grid=(total_rows // rows,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((total_rows, 128), dtype),
    )(a))
    np.asarray(f(x))  # compile + one run
    t = device_time(f, x, k_lo=2, k_hi=22)
    n_el = total_rows * 128
    print(f"stage rate {np.dtype(dtype).name:8s}: "
          f"{n_el * reps / t / 1e9:7.2f} Gelem-stages/s "
          f"({t*1e3:.3f} ms / {reps} stages of {n_el>>20}M)", flush=True)


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
    # reference point: XLA's own sort on the widened keys
    bench("16M u16 lax.sort (XLA baseline)",
          lambda a: trs.sort(a, method="xla"), kj, n, ref)
    # MEASURED DEAD END (2026-08-19, this chip): the scatter-add histogram
    # candidate (counting_sort_u16) never completed ONE 16M run in 35+ min
    # — XLA:TPU's u32 scatter-add lowering is effectively element-serial at
    # this size (consistent with DESIGN.md's ~2 GB/s random-access row,
    # but worse: likely a sort-based or serialized scatter expansion).
    # Kept behind an env flag for re-testing on future compiler versions.
    if os.environ.get("KEYS16_SCATTER"):
        bench("16M u16 counting (scatter hist + cummax)",
              counting_sort_u16, kj, n, ref)
    bench("16M u16 counting (matmul hist + cummax)",
          counting_sort_u16_matmul, kj, n, ref)

    # skewed distribution: counting sort is distribution-oblivious
    kz = np.minimum(rng.zipf(1.3, n), 2**16 - 1).astype(np.uint16)
    refz = np.sort(kz)
    bench("16M u16 Zipf bitonic widened",
          lambda a: trs.sort(a), jnp.asarray(kz), n, refz)
    bench("16M u16 Zipf counting (matmul hist)",
          counting_sort_u16_matmul, jnp.asarray(kz), n, refz)

    # per-stage lane-rate probe: if Mosaic ran 16-bit vectors (2 elements
    # per u32 lane) at ~2x the u32 element rate, a u16-native CE network
    # would halve the keys-only sort time and be worth the engine surgery.
    # MEASURED DEAD END (2026-08-19, this libtpu): Mosaic has no 16-bit
    # vector rotate at all — `tpu.dynamic_rotate` on i16/bf16 fails with
    # "not implemented: Rotate with non-32-bit data", so the network's
    # backbone primitive does not exist one width down (and `arith.minui`
    # doesn't legalize either — the u32 engine's min/max path works only
    # through the biased-signed trick). i32 measured 548.7 Gelem-stages/s.
    for dt in (jnp.int32, jnp.uint16, jnp.int16, jnp.bfloat16):
        try:
            stage_rate(dt)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key = next((ln for ln in msg.splitlines()
                        if "not implemented" in ln or "legalize" in ln),
                       msg.splitlines()[0] if msg else "")
            print(f"stage rate {jnp.dtype(dt).name:8s}: FAILED "
                  f"{type(e).__name__}: {key.strip()}", flush=True)


if __name__ == "__main__":
    main()
