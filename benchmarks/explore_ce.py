"""Microbenchmark: candidate compare-exchange formulations on real TPU.

Round-2 VERDICT: the headline (64M k+v) sits ~4x above the VPU floor and
the named lever is per-stage pair-access cost (2 cyclic rolls + 2 selects
per array per stage). This explorer measures, per stage at 16M u32:

  baseline   roll-partner CE (ops/bitonic.py `_ce_roll`), 1/2/3 arrays
  flip       partner via axis-size-2 flip of the (G, 2, m, 128) pair view
             (1 shuffle instead of 2 rolls + 1 select per array)
  minmax     keys-only: out = where(first, min(x, fwd), max(x, bwd)) —
             drops the compare+XOR decision chain entirely (valid because
             equal-key swaps are byte no-ops; direction pre-XORed upstream)
  flip+minmax  both
  slicing    the reshape/slice/stack CE (`_ce_sublane`) re-tried in small
             per-call chunks (round-1 marked it compile-pathological at
             48-stage chunks; the VERDICT asks for a re-measure)
  u64        (masked key << 32 | rank) packed single array — halves array
             count if Mosaic lowers 64-bit rolls/compares at < 2x u32 cost

Each variant runs 16 sublane stages (mixed strides 128..32768-row-span) in
ONE pallas_call over a 1024-row tile grid; compile seconds are printed
because Mosaic compile pathology is one of the candidate failure modes.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_radix_sort.runtime import device_time
from tpu_radix_sort.ops import bitonic

N = 1 << 24
LANES = 128
ROWS = N // LANES
TILE_ROWS = 1024
T = TILE_ROWS * LANES

# 16 sublane strides, m = j/128 cycling 1..256 rows (like a merge tail)
MS = [1 << (i % 9) for i in range(16)]


def _flip_partner(a, m):
    """partner[i] = a[i ^ (m*128)] via pair-half flip on the 4-D view."""
    g = a.shape[0] // (2 * m)
    a4 = a.reshape(g, 2, m, LANES)
    return a4[:, ::-1].reshape(a.shape)


def _kernel(refs, *, n_arr, variant, stable):
    ins = refs[:n_arr]
    outs = refs[n_arr:]
    arrs = tuple(r[:] for r in ins)
    shape = (TILE_ROWS, LANES)
    rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    for m in MS:
        first = (rid & m) == 0
        if variant == "roll":
            fwd = tuple(pltpu.roll(a, (-m) % TILE_ROWS, axis=0) for a in arrs)
            bwd = tuple(pltpu.roll(a, m % TILE_ROWS, axis=0) for a in arrs)
            partners = tuple(
                jnp.where(first, f, b) for f, b in zip(fwd, bwd)
            )
            e_k, p_k = arrs[0], partners[0]
            if stable and n_arr > 1:
                p_lt = (p_k < e_k) | ((e_k == p_k) & (partners[1] < arrs[1]))
            else:
                p_lt = p_k < e_k
            take = first ^ p_lt  # pure-ascending direction
            arrs = tuple(
                jnp.where(take, p, e) for e, p in zip(arrs, partners)
            )
        elif variant == "flip":
            partners = tuple(_flip_partner(a, m) for a in arrs)
            e_k, p_k = arrs[0], partners[0]
            if stable and n_arr > 1:
                p_lt = (p_k < e_k) | ((e_k == p_k) & (partners[1] < arrs[1]))
            else:
                p_lt = p_k < e_k
            take = first ^ p_lt
            arrs = tuple(
                jnp.where(take, p, e) for e, p in zip(arrs, partners)
            )
        elif variant == "minmax":
            # keys-only ascending: first keeps min(pair) via fwd roll,
            # second keeps max(pair) via bwd roll; no compare chain.
            # Mosaic cannot legalize arith.minui (measured), so run signed
            # min/max on the sign-biased view (x ^ 0x8000_0000): order-
            # preserving, bias XOR hoisted outside the stage loop upstream
            x = jax.lax.bitcast_convert_type(arrs[0], jnp.int32)
            fwd = pltpu.roll(x, (-m) % TILE_ROWS, axis=0)
            bwd = pltpu.roll(x, m % TILE_ROWS, axis=0)
            out = jnp.where(
                first, jnp.minimum(x, fwd), jnp.maximum(x, bwd)
            )
            arrs = (jax.lax.bitcast_convert_type(out, jnp.uint32),)
        elif variant == "xorswap":
            # select-free CE: swapped pairs differ by d = x ^ partner; both
            # sides apply out = x ^ (d & swapmask), swapmask pair-symmetric
            # via one extra roll of the masked diff (zero at second slots)
            fwd = tuple(
                pltpu.roll(a, (-m) % TILE_ROWS, axis=0) for a in arrs
            )
            e_k, p_k = arrs[0], fwd[0]
            if stable and n_arr > 1:
                p_lt = (p_k < e_k) | ((e_k == p_k) & (fwd[1] < arrs[1]))
            else:
                p_lt = p_k < e_k
            sw = p_lt & first  # valid (and nonzero) only at first slots
            sw32 = jnp.uint32(0) - sw.astype(jnp.uint32)  # 0 / 0xFFFFFFFF
            new = []
            for a, f in zip(arrs, fwd):
                e = (a ^ f) & sw32
                msk = e | pltpu.roll(e, m % TILE_ROWS, axis=0)
                new.append(a ^ msk)
            arrs = tuple(new)
        elif variant == "fold2minmax":
            # round-3 VERDICT item 6: extend the keys-only XOR-fold win to
            # the stable 2-array (key, rank) path. Direction is assumed
            # pre-folded into BOTH arrays (keys AND ranks XOR the round
            # mask upstream, so tie order flips with the region too);
            # the key then needs no partner select — min via the fwd roll
            # at first slots, max via the bwd roll at second slots — and
            # only the rank pays the lexicographic decision, one tuple
            # compare per roll direction.
            y = jax.lax.bitcast_convert_type(arrs[0], jnp.int32)
            s = arrs[1]
            yf = pltpu.roll(y, (-m) % TILE_ROWS, axis=0)
            yb = pltpu.roll(y, m % TILE_ROWS, axis=0)
            sf = pltpu.roll(s, (-m) % TILE_ROWS, axis=0)
            sb = pltpu.roll(s, m % TILE_ROWS, axis=0)
            out_y = jnp.where(
                first, jnp.minimum(y, yf), jnp.maximum(y, yb)
            )
            tl_f = (yf < y) | ((yf == y) & (sf < s))
            tl_b = (yb < y) | ((yb == y) & (sb < s))
            out_s = jnp.where(
                first,
                jnp.where(tl_f, sf, s),   # first keeps tuple-min
                jnp.where(tl_b, s, sb),   # second keeps tuple-max
            )
            arrs = (jax.lax.bitcast_convert_type(out_y, jnp.uint32), out_s)
        elif variant == "fold3minmax":
            # fold2 extended to the 3-array (key, idx, payload) assembly
            # (generic k+v and masked-key sorts): direction folded into key
            # AND idx upstream, payload co-moves on the same tuple verdicts.
            # Same roll count as baseline (2/array); the key drops its
            # decision chain, each other array pays one extra select.
            y = jax.lax.bitcast_convert_type(arrs[0], jnp.int32)
            s, p = arrs[1], arrs[2]
            yf = pltpu.roll(y, (-m) % TILE_ROWS, axis=0)
            yb = pltpu.roll(y, m % TILE_ROWS, axis=0)
            sf = pltpu.roll(s, (-m) % TILE_ROWS, axis=0)
            sb = pltpu.roll(s, m % TILE_ROWS, axis=0)
            pf = pltpu.roll(p, (-m) % TILE_ROWS, axis=0)
            pb = pltpu.roll(p, m % TILE_ROWS, axis=0)
            out_y = jnp.where(
                first, jnp.minimum(y, yf), jnp.maximum(y, yb)
            )
            tl_f = (yf < y) | ((yf == y) & (sf < s))
            tl_b = (yb < y) | ((yb == y) & (sb < s))
            out_s = jnp.where(
                first, jnp.where(tl_f, sf, s), jnp.where(tl_b, s, sb)
            )
            out_p = jnp.where(
                first, jnp.where(tl_f, pf, p), jnp.where(tl_b, p, pb)
            )
            arrs = (jax.lax.bitcast_convert_type(out_y, jnp.uint32),
                    out_s, out_p)
        elif variant == "flipminmax":
            x = arrs[0]
            p = _flip_partner(x, m)
            arrs = (
                jnp.where(first, jnp.minimum(x, p), jnp.maximum(x, p)),
            )
        elif variant == "u64":
            x = arrs[0]
            fwd = pltpu.roll(x, jnp.int32((-m) % TILE_ROWS), axis=0)
            bwd = pltpu.roll(x, jnp.int32(m % TILE_ROWS), axis=0)
            p = jnp.where(first, fwd, bwd)
            take = first ^ (p < x)
            arrs = (jnp.where(take, p, x),)
        else:
            raise ValueError(variant)
    for o, a in zip(outs, arrs):
        o[:] = a


def run_variant(x, n_arr, variant, stable, dtype=jnp.uint32):
    import functools

    arrs = tuple((x + i).astype(dtype) for i in range(n_arr))
    spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        lambda *refs: _kernel(refs, n_arr=n_arr, variant=variant,
                              stable=stable),
        grid=(ROWS // TILE_ROWS,),
        in_specs=[spec] * n_arr,
        out_specs=[spec] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), dtype)] * n_arr,
        input_output_aliases={i: i for i in range(n_arr)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bitonic.VMEM_LIMIT_BYTES
        ),
    )(*arrs)
    return out[0]


def bench(name, n_arr, variant, stable=False, dtype=jnp.uint32):
    try:
        t0 = time.time()
        f = jax.jit(lambda a: run_variant(a, n_arr, variant, stable, dtype))
        x = jax.random.bits(
            jax.random.PRNGKey(0), (ROWS, LANES), dtype=jnp.uint32
        )
        np.asarray(f(x).ravel()[0])
        compile_s = time.time() - t0
        # long chains: a sub-ms op under the ~25-30 ms tunnel sync needs
        # O(100) chained iterations for a clean slope (CLAUDE.md noise note)
        t = device_time(f, x, k_lo=10, k_hi=110)
        ns = len(MS)
        print(
            f"{name:44s} {t*1e3:8.3f} ms  {t/ns*1e6:7.1f} us/st  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        if os.environ.get("CE_TRACE"):
            traceback.print_exc()


def bench_slicing_chunked(n_arr, stable, chunk):
    """USE_SLICING_CE through the real engine machinery, `chunk` stages/call."""
    name = f"slicing CE ({n_arr} arr, {chunk} st/call)"
    old_cap, old_flag = bitonic.MAX_ARRAY_STAGES_PER_CALL, bitonic.USE_SLICING_CE
    bitonic.MAX_ARRAY_STAGES_PER_CALL = chunk * n_arr
    bitonic.USE_SLICING_CE = True
    try:
        stages = [(1 << 25, 128 * m) for m in MS]

        def f(a):
            arrs = tuple(a + i for i in range(n_arr))
            out = bitonic._run_network(
                arrs, stable, stages,
                grid=(ROWS // TILE_ROWS,),
                block_shape=(TILE_ROWS, LANES),
                index_map=lambda i: (i, 0),
                base_scale=T,
                kernel_rows=TILE_ROWS,
                block_elems=T,
                interpret=False,
            )
            return out[0]

        t0 = time.time()
        jf = jax.jit(f)
        x = jax.random.bits(
            jax.random.PRNGKey(0), (ROWS, LANES), dtype=jnp.uint32
        )
        np.asarray(jf(x).ravel()[0])
        compile_s = time.time() - t0
        t = device_time(jf, x, k_lo=2, k_hi=20)
        print(
            f"{name:44s} {t*1e3:8.3f} ms  {t/len(MS)*1e6:7.1f} us/st  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        bitonic.MAX_ARRAY_STAGES_PER_CALL = old_cap
        bitonic.USE_SLICING_CE = old_flag


def bench_engine_fold2(n=1 << 26):
    """Full-engine A/B of the folded fast paths on the headline shape:
    USE_FOLD2_CE on 64M k+v rank-payload (the 2-array stable path) and
    USE_FOLD3_CE on 64M k+v generic payload (the 3-array path). Decides
    round-3 VERDICT item 6: flip each default iff ON beats OFF here.
    jax.clear_caches() between flips: the flags are read at trace time, so
    a warm _sort_jit cache would silently reuse the OFF pipeline."""
    import tpu_radix_sort as trs
    from tpu_radix_sort.ops import bitonic as b

    k = jax.random.bits(jax.random.PRNGKey(7), (n,), dtype=jnp.uint32)
    v = jnp.arange(n, dtype=jnp.uint32)
    for attr, ranks in (("USE_FOLD2_CE", True), ("USE_FOLD3_CE", False)):
        for flag in (False, True):
            old = getattr(b, attr)
            setattr(b, attr, flag)
            jax.clear_caches()
            try:
                t0 = time.time()

                def f(kk, vv):
                    return trs.sort(kk, vv, method="bitonic",
                                    values_are_ranks=ranks)

                ok, ov = f(k, v)
                np.asarray(ok[:1])
                compile_s = time.time() - t0
                # k_hi=3, not 10: each chained iteration unrolls the FULL
                # 64M pipeline into the HLO, and the remote-compile helper
                # rejects >~N-stage bodies outright (HTTP 413, observed
                # 2026-08-18 at k_hi=10; bench.py's k_hi=3 compiles). At
                # ~130 ms/op the 2-iteration delta is ~260 ms, far above
                # the ~1 ms sync noise, so short chains are exact here.
                t = device_time(lambda kk: f(kk, v)[0], k, k_lo=1, k_hi=3)
                kind = "rank-payload" if ranks else "generic     "
                name = (f"engine 64M k+v {kind} "
                        f"{attr[4:9].lower()}={'ON ' if flag else 'OFF'}")
                print(f"{name:44s} {t*1e3:8.3f} ms  "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                print(f"engine {attr}={flag} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
            finally:
                setattr(b, attr, old)
    jax.clear_caches()


def main():
    print("device:", jax.devices()[0], flush=True)
    print(f"16 sublane stages at {N>>20}M u32, tile {TILE_ROWS}x{LANES}",
          flush=True)
    bench("baseline roll (1 arr)", 1, "roll")
    bench("baseline roll (2 arr stable)", 2, "roll", stable=True)
    bench("baseline roll (3 arr stable)", 3, "roll", stable=True)
    bench("minmax biased-signed keys-only (1 arr)", 1, "minmax")
    bench("fold2: minmax key + tuple-cmp rank (2 arr)", 2, "fold2minmax",
          stable=True)
    bench("fold3: minmax key + idx + payload (3 arr)", 3, "fold3minmax",
          stable=True)
    bench_engine_fold2()
    bench("xorswap select-free (1 arr)", 1, "xorswap")
    bench("xorswap select-free (2 arr stable)", 2, "xorswap", stable=True)
    bench("xorswap select-free (3 arr stable)", 3, "xorswap", stable=True)
    if os.environ.get("CE_ALL"):
        # measured dead ends (kept re-runnable): rev unimplemented in the
        # Pallas TPU lowering; slicing CE 3-6x slower at runtime even in
        # 8-stage chunks; u64 dynamic_rotate rejects i64 operands
        bench("flip partner (1 arr)", 1, "flip")
        bench("flip partner (2 arr stable)", 2, "flip", stable=True)
        bench_slicing_chunked(1, False, 8)
        bench_slicing_chunked(2, True, 8)
        jax.config.update("jax_enable_x64", True)
        try:
            bench("u64 packed roll (1 arr)", 1, "u64", dtype=jnp.uint64)
        finally:
            jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fold-engine":
        # just the full-engine fold A/B (the BENCH.md dangling-claim
        # closer) — the per-stage sweep re-ran in round 4 and is stable.
        # Optional argv[2] = element count: at 64M even the UN-chained
        # k+v pipeline exceeds the remote-compile body cap (all 4 configs
        # HTTP 413, 2026-08-19), so 32M is the largest measurable shape.
        print("device:", jax.devices()[0], flush=True)
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 26
        bench_engine_fold2(n)
    else:
        main()
