"""Workload benchmarks on the real chip (BASELINE.json configs 1-3, 5).

- 256K uint32 keys-only           (config 1)
- 4M uint32 key+value             (config 2)
- 16M float32 nearly-sorted with check_order early exit (config 3)
- 16M Zipfian-skewed uint32       (config 5, single-chip: the comparison
  engine is skew-immune by construction — this documents it)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_sort
from tpu_radix_sort.runtime import device_time


# WORKLOADS_FROM=<substring>: skip rows until the first whose name contains
# the substring (case-insensitive). Lets a partial capture resume where a
# crash or a tunnel wedge stopped it instead of re-paying every earlier row.
_FROM = os.environ.get("WORKLOADS_FROM", "").lower()
_started = not _FROM


def bench(name, fn, x, n, check=None, time_fn=None):
    """One golden-checked row. `fn` is checked once un-chained; timing uses
    `time_fn` when given — required when `fn` is not endomorphic (the chain
    in device_time is a fori_loop whose carry is the input, so output types
    must equal input types; a bool-returning check op needs a same-typed
    wrapper that still data-depends on the op's result). Rows fail soft so
    one bad row cannot kill the whole capture block."""
    global _started
    if not _started:
        if _FROM in name.lower():
            _started = True
        else:
            print(f"{name:48s} SKIP (WORKLOADS_FROM)", flush=True)
            return
    try:
        f = jax.jit(fn)
        out = f(x)
        if check is not None:
            leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
            ok = check(leaves)
        else:
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            ok = True
        # few-ms ops auto-escalate to a longer chain inside device_time
        # (runtime/timing.py): the fixed ~25-30 ms host-sync cost would swamp
        # a 2-iteration delta
        t = device_time(jax.jit(time_fn) if time_fn is not None else f,
                        x, k_lo=1, k_hi=3)
        print(f"{name:48s} {t*1e3:9.3f} ms  {n/t/1e9:7.3f} Gkeys/s  ok={ok}",
              flush=True)
    except Exception as e:  # noqa: BLE001 — capture block must keep going
        print(f"{name:48s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # config 1: 256K keys-only
    n = 1 << 18
    k = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    ref = golden_sort(np.asarray(k))
    bench("256K u32 keys-only", lambda a: trs.sort(a), k, n,
          check=lambda ls: np.array_equal(ls[0], ref))

    # config 2: 4M k+v
    n = 1 << 22
    k = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    v = jnp.arange(n, dtype=jnp.uint32)
    rk, rv = golden_sort(np.asarray(k), np.asarray(v))
    bench("4M u32 key+value", lambda kv: tuple(trs.sort(*kv)), (k, v), n,
          check=lambda ls: np.array_equal(ls[0], rk) and np.array_equal(ls[1], rv))

    # config 3: 16M float32 nearly-sorted, check_order
    n = 1 << 24
    f = np.sort(rng.random(n, dtype=np.float32))
    fj = jnp.asarray(f)
    bench("16M f32 sorted, check_order=True (early exit)",
          lambda a: trs.sort(a, check_order=True), fj, n,
          check=lambda ls: np.array_equal(ls[0], f))
    bench("16M f32 sorted, check_order=False",
          lambda a: trs.sort(a), fj, n)

    # the losing half of the check_order trade (reference README "Order
    # checking" discusses both sides): unsorted input pays the fast+full
    # reduction before the full sort runs. The timing chain feeds output
    # back to input, so a plain sort(.) would early-exit from iteration 2
    # on; XOR-ing the sign bit each step re-unsorts the data (two sorted
    # runs, inversion past the fast window => the full gate always runs)
    # at identical cost in both the gated and baseline steps. The
    # comparison engine is data-oblivious, so the sort cost is the same
    # as for random input.
    ku = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    refu = golden_sort(np.asarray(ku) ^ np.uint32(0x80000000))
    flip = jnp.uint32(0x80000000)
    bench("16M u32 unsorted, check_order=True (gate overhead)",
          lambda a: trs.sort(a ^ flip, check_order=True), ku, n,
          check=lambda ls: np.array_equal(ls[0], refu))
    bench("16M u32 unsorted, check_order=False (same step, baseline)",
          lambda a: trs.sort(a ^ flip), ku, n,
          check=lambda ls: np.array_equal(ls[0], refu))

    # config 5: 16M Zipf-skewed keys (hot buckets)
    n = 1 << 24
    z = rng.zipf(1.3, size=n).astype(np.uint32)  # heavy head skew
    zj = jnp.asarray(z)
    refz = golden_sort(z)
    bench("16M u32 Zipf(1.3) skewed", lambda a: trs.sort(a), zj, n,
          check=lambda ls: np.array_equal(ls[0], refz))

    # 16M key+value: generic payload (3-array engine) vs rank payload
    # (2-array engine, the argsort/bench.py path) — byte-identical output
    n = 1 << 24
    k = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    v = jnp.arange(n, dtype=jnp.uint32)
    rk, rv = golden_sort(np.asarray(k), np.asarray(v))
    chk = lambda ls: np.array_equal(ls[0], rk) and np.array_equal(ls[1], rv)
    bench("16M u32 key+value (generic payload)",
          lambda kv: tuple(trs.sort(*kv)), (k, v), n, check=chk)
    bench("16M u32 key+value (rank payload / argsort)",
          lambda kv: tuple(trs.sort(*kv, values_are_ranks=True)), (k, v), n,
          check=chk)

    # the standalone public prefix-scan op (the reference's PrefixSumKernel,
    # src/kernels/PrefixSumKernel.ts) vs XLA's own cumsum on the same chip
    n = 1 << 24
    x = jnp.asarray(rng.integers(0, 8, n, dtype=np.uint64).astype(np.uint32))
    xs = np.cumsum(np.asarray(x), dtype=np.uint32)
    ref_scan = np.concatenate([[np.uint32(0)], xs[:-1]]).astype(np.uint32)
    bench("16M u32 exclusive prefix scan (Pallas)",
          lambda a: trs.prefix_sum(a), x, n,
          check=lambda ls: np.array_equal(ls[0], ref_scan))
    bench("16M u32 exclusive prefix scan (XLA cumsum)",
          lambda a: jnp.concatenate(
              [jnp.zeros(1, jnp.uint32), jnp.cumsum(a)[:-1]]), x, n,
          check=lambda ls: np.array_equal(ls[0], ref_scan))

    # order checks at a NON-multiple of the Pallas disorder kernel's block
    # (256K elements): round-2 VERDICT item 4 — sentinel padding keeps such
    # sizes on the kernel path instead of the slow XLA reduction
    n = (1 << 24) + 4096 + 128
    so = np.sort(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    soj = jnp.asarray(so)
    # timing chain needs a same-typed carry (fori_loop endomorphism), so the
    # bool verdict folds back into the array: XOR with verdict*0 is a no-op
    # on the data but keeps the check on the dependency path (ADVICE r4 #1)
    bench("16M+4K u32 is_sorted (non-multiple, Pallas path)",
          lambda a: trs.is_sorted(a), soj, n,
          check=lambda ls: bool(ls[0]),
          time_fn=lambda a: a ^ (trs.is_sorted(a).astype(jnp.uint32) * 0))
    del so, soj

    # the exchange strategy's local phase 4 (round-2 VERDICT item 2):
    # D=8 received sorted runs in pow2 slots finished by the log2(D)-round
    # bitonic merge tree vs the old full O(log^2 n) re-sort, at a 16M
    # shard-equivalent. Runs alternate direction (bitonic round-k state).
    from tpu_radix_sort.ops import bitonic as _bt
    n = 1 << 24
    slots, S = 8, (1 << 24) // 8
    mk = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    runs = np.sort(mk.reshape(slots, S), axis=1)
    runs[1::2] = runs[1::2, ::-1]
    rmj = jnp.asarray(runs.reshape(n))
    ref_m = np.sort(mk)
    bench("16M local phase: merge tree over 8 slots (new)",
          lambda a: _bt.merge_tree_padded((a,), run=S, stable=False)[0],
          rmj, n, check=lambda ls: np.array_equal(ls[0], ref_m))
    bench("16M local phase: full re-sort (old phase 4)",
          lambda a: _bt.sort_padded((a,), stable=False)[0],
          rmj, n, check=lambda ls: np.array_equal(ls[0], ref_m))
    del mk, runs, rmj, ref_m

    # the 4-way LSD radix compatibility engine (method='radix'), documented
    # honestly at 4M (DESIGN.md: its in-VMEM compaction is VPU-costlier;
    # the measured refutation of faster radix constructions is in DESIGN.md
    # "Speed-of-light accounting" + benchmarks/explore_msd.py)
    n = 1 << 22
    k4 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    rk4 = golden_sort(np.asarray(k4))
    bench("4M u32 keys-only, method='radix'",
          lambda a: trs.sort(a, method="radix"), k4, n,
          check=lambda ls: np.array_equal(ls[0], rk4))
    # all-equal keys make EVERY reorder block single-digit at every pass —
    # the exact packed-cumsum 2^16 wrap edge of the compiled kernel
    # (ops/radix.py packed pair cumsums); golden-checked on chip
    ke = jnp.asarray(np.full(n, 0x9E3779B9, np.uint32))
    bench("4M u32 all-equal keys, method='radix' (wrap edge)",
          lambda a: trs.sort(a, method="radix"), ke, n,
          check=lambda ls: np.array_equal(
              ls[0], np.full(n, 0x9E3779B9, np.uint32)))
    del k4, rk4, ke

    # 16M compiled radix golden gate (round-3 VERDICT item 4): at 16M with
    # the default 512-row blocks, 256 reorder blocks coexist — sequential-
    # grid window ownership, window-DMA overlaps, and (all-equal row) the
    # packed-field wrap edge all interact, which no interpret-mode test
    # reaches. The deficit-shift reorder (ops/radix.py:127-241) is the
    # subtlest kernel in the repo; this is its at-scale correctness gate.
    n = 1 << 24
    k16 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    rk16 = golden_sort(np.asarray(k16))
    bench("16M u32 keys-only, method='radix' (golden gate)",
          lambda a: trs.sort(a, method="radix"), k16, n,
          check=lambda ls: np.array_equal(ls[0], rk16))
    ke16 = jnp.asarray(np.full(n, 0x9E3779B9, np.uint32))
    bench("16M u32 all-equal keys, method='radix' (wrap edge)",
          lambda a: trs.sort(a, method="radix"), ke16, n,
          check=lambda ls: np.array_equal(
              ls[0], np.full(n, 0x9E3779B9, np.uint32)))
    del k16, rk16, ke16

    # 64M radix golden gate (round-4 VERDICT item 4): the reorder kernel's
    # SMEM offset prefetch + window-DMA slack math (ops/radix.py:262-268)
    # executed at the headline scale, not just asserted to 2^31
    n = 1 << 26
    k64m_np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    k64m = jnp.asarray(k64m_np)
    rk64m = np.sort(k64m_np)
    bench("64M u32 keys-only, method='radix' (golden gate)",
          lambda a: trs.sort(a, method="radix"), k64m, n,
          check=lambda ls: np.array_equal(ls[0], rk64m))
    del k64m, rk64m, k64m_np

    # segmented (ragged) sorts on chip (round-4 VERDICT item 3): golden +
    # perf, incl. pricing the composite key against the row-local optimum
    # on equal segments (the measured decision the docstring used to argue)
    n = 1 << 24
    S = 4096
    w = rng.zipf(1.3, S).astype(np.float64)
    # multinomial draw: sums to n exactly, every segment >= 1, sizes
    # Zipf-proportional (the old truncate-and-dump-into-sizes[0] scheme
    # drove sizes[0] negative when the tail's rounding surplus exceeded
    # the head — crashed the first r5 workloads capture)
    sizes = rng.multinomial(n - S, w / w.sum()).astype(np.int64) + 1
    assert sizes.min() >= 1 and sizes.sum() == n
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    kseg = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    seg_ids = np.repeat(np.arange(S), sizes)
    ref_seg = kseg[np.lexsort((kseg, seg_ids))]
    oj = jnp.asarray(offs)
    bench("16M u32 segmented S=4096 ragged Zipf (composite)",
          lambda a: trs.sort_segments(a, oj), jnp.asarray(kseg), n,
          check=lambda ls: np.array_equal(ls[0], ref_seg))
    S2, L2 = 1024, (1 << 24) // 1024
    offs2 = jnp.asarray(np.arange(S2 + 1, dtype=np.int32) * L2)
    ref_eq = np.sort(kseg.reshape(S2, L2), axis=1)
    bench("16M u32 segmented S=1024 equal (composite)",
          lambda a: trs.sort_segments(a, offs2), jnp.asarray(kseg), n,
          check=lambda ls: np.array_equal(ls[0].reshape(S2, L2), ref_eq))
    bench("16M u32 batched 1024x16K (row-local, same data)",
          lambda a: trs.sort_batched(a), jnp.asarray(kseg.reshape(S2, L2)), n,
          check=lambda ls: np.array_equal(ls[0], ref_eq))
    del kseg, ref_seg, ref_eq, seg_ids

    # 16-bit keys: bfloat16 — the TPU-native dtype (round-4 VERDICT item 6;
    # the full u16 candidate A/B lives in explore_keys16.py)
    import ml_dtypes
    n = 1 << 24
    kbf = rng.standard_normal(n).astype(ml_dtypes.bfloat16)
    ref_bf = np.sort(kbf).view(np.uint16)
    bench("16M bf16 keys-only total_order (widened u16)",
          lambda a: trs.sort(a, total_order=True), jnp.asarray(kbf), n,
          check=lambda ls: np.array_equal(ls[0].view(np.uint16), ref_bf))
    del kbf, ref_bf

    # past the reference's ceiling: its default WebGPU limits cap at 2^26
    # elements (maxBufferSize, README.md:100-106); one v5e chip does 2^27+
    n = 1 << 27
    k128np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    k128 = jnp.asarray(k128np)
    ref128 = np.sort(k128np)
    bench("128M u32 keys-only (2x the reference's ceiling)",
          lambda a: trs.sort(a), k128, n,
          check=lambda ls: np.array_equal(ls[0], ref128))
    v128 = jnp.arange(n, dtype=jnp.uint32)
    order128 = np.argsort(k128np, kind="stable").astype(np.uint32)
    bench("128M u32 key+value (rank payload)",
          lambda kv: tuple(trs.sort(*kv, values_are_ranks=True)), (k128, v128), n,
          check=lambda ls: np.array_equal(ls[0], ref128)
          and np.array_equal(ls[1], order128))
    del k128, v128, ref128, order128, k128np

    # non-pow2 split-sort: 65M would pad to 128M (2x) without the split
    n = (1 << 26) + (1 << 20)
    k65np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    k65 = jnp.asarray(k65np)
    ref65 = np.sort(k65np)
    bench("65M u32 keys-only (non-pow2 split-sort)",
          lambda a: trs.sort(a), k65, n,
          check=lambda ls: np.array_equal(ls[0], ref65))
    del k65, ref65, k65np

    # 256M keys-only: 4x the reference's ceiling on one chip
    n = 1 << 28
    k256np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    k256 = jnp.asarray(k256np)
    ref256 = np.sort(k256np)
    bench("256M u32 keys-only (4x the reference's ceiling)",
          lambda a: trs.sort(a), k256, n,
          check=lambda ls: np.array_equal(ls[0], ref256))
    del k256, ref256, k256np

    # batched per-row sorts (extension; ops/batched.py): 1024 rows x 16K =
    # 16M elements through the row-local bitonic network vs XLA's
    # natively-batched lax.sort on the same shape
    B, nrow = 1024, 1 << 14
    kb_np = rng.integers(0, 2**32, (B, nrow), dtype=np.uint64).astype(np.uint32)
    kb = jnp.asarray(kb_np)
    refb = np.sort(kb_np, axis=1)
    bench("16M batched 1024x16K per-row (row-local bitonic)",
          lambda a: trs.sort_batched(a), kb, B * nrow,
          check=lambda ls: np.array_equal(ls[0], refb))
    bench("16M batched 1024x16K per-row (XLA lax.sort)",
          lambda a: trs.sort_batched(a, method="xla"), kb, B * nrow,
          check=lambda ls: np.array_equal(ls[0], refb))
    del kb, kb_np, refb

    # 64-bit keys (extension; ops/sort64.py): (hi, lo) u32 column pairs
    # through the same network — golden-gated at 16M on chip. x64 mode is
    # flipped on for this section only (it is part of the jit cache key,
    # so earlier rows' executables are unaffected; cleared after anyway).
    jax.config.update("jax_enable_x64", True)
    try:
        n = 1 << 24
        k64np = rng.integers(0, 2**64, n, dtype=np.uint64)
        k64 = jnp.asarray(k64np)
        ref64 = np.sort(k64np)
        bench("16M u64 keys-only (2-column lexicographic)",
              lambda a: trs.sort(a), k64, n,
              check=lambda ls: np.array_equal(ls[0], ref64))
        v64 = jnp.arange(n, dtype=jnp.uint32)
        order64 = np.argsort(k64np, kind="stable").astype(np.uint32)
        bench("16M u64 key+value (rank payload)",
              lambda kv: tuple(trs.sort(*kv, values_are_ranks=True)),
              (k64, v64), n,
              check=lambda ls: np.array_equal(ls[0], ref64)
              and np.array_equal(ls[1], order64))
        del k64, v64, ref64, order64, k64np
        # 64-bit value payloads (round-4 VERDICT item 7): u32 keys carrying
        # an 8-byte payload as an (hi, lo) u32 column pair — same engine,
        # one extra moved column vs a u32 payload
        kv_np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        vv_np = rng.integers(0, 2**64, n, dtype=np.uint64)
        ordv = np.argsort(kv_np, kind="stable")
        rkv, rvv = kv_np[ordv], vv_np[ordv]
        bench("16M u32 keys + u64 values ((hi,lo) payload)",
              lambda kv: tuple(trs.sort(*kv)),
              (jnp.asarray(kv_np), jnp.asarray(vv_np)), n,
              check=lambda ls: np.array_equal(ls[0], rkv)
              and np.array_equal(ls[1], rvv))
        del kv_np, vv_np, ordv, rkv, rvv
    finally:
        jax.config.update("jax_enable_x64", False)
        jax.clear_caches()


if __name__ == "__main__":
    main()
