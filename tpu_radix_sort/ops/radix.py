"""4-way LSD radix pipeline (Pallas TPU kernels) — compatibility engine.

Reference counterparts, reproduced kernel-for-kernel:

- digit histogram ("blockSum") kernel: per block, count 2-bit digits into a
  **digit-major** [R x nblocks] table (`src/shaders/RadixSort.ts:110-114`) —
  the reference's central invariant: scanning that table digit-major yields,
  per (digit, block), simultaneously the global digit offset and the stable
  within-digit block offset.
- prefix scan over the table: reuses the streaming Pallas scan
  (`ops/scan.py`, the reference's embedded PrefixSumKernel,
  `AbstractRadixSortKernel.ts:110-129`).
- reorder kernel (`src/shaders/RadixSortReorder.ts:97-101`): the reference
  scatters each element to `prefix_block_sum[digit * WGC + WID] + local_rank`.
  A random HBM scatter is element-serial on TPU, so the movement is
  re-expressed two-level:
    1. in-VMEM stable compaction of each block's per-digit run via
       log-stride shifts (collision-free: LSB-first shifting by the bits of
       each element's original deficit is injective — proof in DESIGN.md),
    2. per-(block, digit) contiguous runs written to their global offset by
       read-merge-write window DMAs (runs are variable-length; windows are
       block-sized and preserve foreign bytes, so sequential grid order
       makes every position eventually owned by exactly one run).

Performance role: on a single chip the compare-exchange engine
(`ops/bitonic.py`) is faster (DESIGN.md cost model: the compaction costs
~1k VPU ops/elt/pass); this engine exists for pipeline parity — the
reference's exact algorithm and pass structure, selectable via
``method='radix'``, including the mid-sort order-check early exit. The
reference ships its own alternate code paths disabled-by-default the same
way (`README.md:124-168`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import checksort, common, scan

LANES = 128
DEFAULT_BLOCK_ROWS = 512
RADIX_BITS = 2
R = 1 << RADIX_BITS  # 4-way, reference-faithful (src/shaders/RadixSort.ts:61)

# The reference runs its fast+full order check before every 2nd pass
# (`AbstractRadixSortKernel.ts:257` — `i % 2 == 0`).
CHECK_EVERY_PASSES = 2


# ---------------------------------------------------------------- histogram


def _hist_kernel(bit_ref, x_ref, o_ref):
    # counts are scalars: write them through SMEM (a (R, 1) VMEM block would
    # violate the (8, 128) tiling minimum of the Mosaic lowering).
    # `bit` arrives as a prefetched scalar so every pass of the LSD loop
    # shares ONE compiled kernel (DESIGN.md "bake nothing per-round").
    b = pl.program_id(0)
    bit = bit_ref[0].astype(jnp.uint32)
    dig = (x_ref[:] >> bit) & jnp.uint32(R - 1)
    for r in range(R):
        # f32 mask count (common.sum_scalar_u32): exact below 2^24, immune
        # to the x64 lowering-time promotion that kills integer scalar sums
        o_ref[r, b] = common.sum_scalar_u32(dig == r)


def digit_histogram(u, *, bit, block_rows=None, interpret=None):
    """Digit-major [R, nblocks] histogram of 2-bit digits at `bit`.

    `u` must be (nblocks*block_rows, 128) u32 (pad upstream with sentinels).
    `bit` may be a Python int or a traced i32 scalar (the pass loops trade
    it in as a loop-carried value so all passes share one compilation).
    """
    if interpret is None:
        interpret = common.default_interpret()
    rows = u.shape[0]
    block_rows = min(rows, block_rows or DEFAULT_BLOCK_ROWS)
    nblocks = rows // block_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b, bit: (b, common.IM0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    with common.i32_trace():
        return pl.pallas_call(
            _hist_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, nblocks), jnp.uint32),
            interpret=interpret,
        )(jnp.asarray([bit], jnp.int32), u)


def bucket_offsets(hist, *, interpret=None):
    """Exclusive scan of the digit-major histogram -> global run offsets.

    offsets[r, b] = start position of block b's digit-r run in the output
    (the reference's `prefix_block_sum`, `RadixSortReorder.ts:97-99`).
    """
    r, nblocks = hist.shape
    flat = hist.reshape(r * nblocks)
    out = scan.prefix_sum(flat, inclusive=False, interpret=interpret)
    return out.reshape(r, nblocks)


# ------------------------------------------------------------------ reorder


def _cumsum_mask(mask_u32, rows):
    """Inclusive row-major cumsum of a (rows, 128) u32 0/1 tile."""
    x = mask_u32
    s = 1
    while s < LANES:
        x = x + scan._masked_shift(x, s, 1)
        s *= 2
    own = x[:, LANES - 1:]
    tot = own
    s = 1
    while s < rows:
        tot = tot + scan._masked_shift(tot, s, 0)
        s *= 2
    return x + (tot - own)


def _reorder_kernel(offs_ref, *refs, n_arr, rows):
    """One block: 4-way stable split in VMEM + window-DMA runs to HBM.

    offs_ref = prefetched scalars: [bit, offsets (R * nblocks, digit-major)].
    refs = in VMEM blocks (n_arr) | aliased HBM operands (n_arr, unused) |
           out HBM refs (n_arr) | scratch: win (n_arr, rows+1, 128) | sem (2,)
    """
    b = pl.program_id(0)
    ins = refs[:n_arr]
    outs = refs[2 * n_arr : 3 * n_arr]  # aliased with operands n_arr..2n_arr
    win = refs[3 * n_arr]
    sem = refs[3 * n_arr + 1]

    key = ins[0][:]
    bit = offs_ref[0].astype(jnp.uint32)
    dig = (key >> bit) & jnp.uint32(R - 1)
    shape = (rows, LANES)
    rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = rid * LANES + cid
    n_local = rows * LANES

    # Packed pair cumsums: digits (0,1) share one log-shift cumsum via
    # 16-bit fields of a u32 (digit r at bit 0, r+1 at bit 16), halving the
    # cumsum count per pass. Sound ONLY while n_local <= 2^16: a field can
    # then reach 2^16 only when ALL elements carry that digit; the carry
    # lands at the very last cell, whose corrupted deficit has only bit 16
    # set — above the shift loop's log2(n_local) rounds, so it moves nothing
    # (the true deficit there is 0). Exact run lengths come from `cnts`
    # (independent i32 reductions), never from the possibly-wrapped field.
    # For larger blocks (block_rows > 512) a digit run can exceed 2^16
    # mid-tile and the packing silently corrupts deficits, so those blocks
    # take full-width u32 per-digit cumsums instead (2x cumsum work, still
    # byte-exact — the tiling invariant beats the micro-optimization).
    digi = dig.astype(jnp.int32)
    if n_local <= 1 << 16:
        packed = []
        for lo in range(0, R, 2):
            p = (digi == lo).astype(jnp.uint32) + (
                (digi == lo + 1).astype(jnp.uint32) << jnp.uint32(16)
            )
            packed.append(_cumsum_mask(p, rows))

        def digit_inc(r):
            return (
                packed[r // 2] >> jnp.uint32(16 * (r % 2))
            ) & jnp.uint32(0xFFFF)
    else:
        full = [
            _cumsum_mask((digi == r).astype(jnp.uint32), rows)
            for r in range(R)
        ]

        def digit_inc(r):
            return full[r]
    cnts = [
        common.sum_scalar_u32(digi == r)
        for r in range(R)
    ]

    data0 = tuple(rf[:] for rf in ins)
    for r in range(R):
        mask_u = (digi == r).astype(jnp.uint32)
        inc = digit_inc(r)
        cnt = cnts[r]
        # deficit: how far left each kept element must travel (= non-r
        # elements before it). LSB-first shifting by its bits is
        # collision-free (DESIGN.md). Nonzero ONLY at cells holding a kept
        # element that still has to move: the deficit doubles as the
        # occupancy state, so the shift loop needs no separate kept/arrived
        # masks — `t = shl(d * mv)` is nonzero exactly at landing cells
        # (a mover's bit log_s is set, so its carried d >= s > 0).
        d = (jnp.asarray(idx, jnp.uint32) - (inc - mask_u)) * mask_u
        data = data0
        s = 1
        log_s = 0
        while s < n_local:
            mv_u = (d >> jnp.uint32(log_s)) & jnp.uint32(1)

            if s >= LANES:
                # whole-row shift: no lane boundary crossing
                m = (s // LANES) % rows
                shl = lambda a: pltpu.roll(
                    a, common.roll_shift_i32((-m) % rows), axis=0)
            else:
                # row-major left shift by s < 128 crosses row boundaries:
                # lanes >= 128-s pull from the next row
                def shl(a, _s=s):
                    r1 = pltpu.roll(a, common.roll_shift_i32((-_s) % LANES),
                                    axis=1)
                    r2 = pltpu.roll(r1, common.roll_shift_i32(
                        (rows - 1) % rows), axis=0)
                    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                    return jnp.where(lane < LANES - _s, r1, r2)

            t = shl(d * mv_u)  # deficit rides the move; 1 roll, no mask roll
            arrived = t != 0
            data = tuple(jnp.where(arrived, shl(a), a) for a in data)
            # landings take the carried deficit; vacated cells zero out so
            # their stale high bits can't trigger ghost moves later
            d = jnp.where(arrived, t, d * (jnp.uint32(1) - mv_u))
            s *= 2
            log_s += 1
        # runs now left-packed in `data`[:cnt]; window read-merge-write
        off = offs_ref[1 + r * pl.num_programs(0) + b]
        row0 = off // LANES
        col0 = off % LANES
        # window covers [row0, row0 + rows + 1) rows so any lane offset fits
        for a in range(n_arr):
            rd = pltpu.make_async_copy(
                outs[a].at[pl.ds(row0, rows + 1)], win.at[a], sem.at[0]
            )
            rd.start()
            rd.wait()
            # place run element p at window position col0 + p: lane-roll by
            # col0, then pick row w (lanes >= col0) or row w-1 (lanes wrap)
            src = data[a]
            w = win[a]
            shifted = pltpu.roll(src, common.roll_shift_i32(col0 % LANES),
                                 axis=1)
            zrow = jnp.zeros((1, LANES), jnp.uint32)
            lo = jnp.concatenate([shifted, zrow], axis=0)  # row w
            hi = jnp.concatenate([zrow, shifted], axis=0)  # row w-1
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows + 1, LANES), 1)
            placed = jnp.where(lane >= col0, lo, hi)
            wpos = (
                jax.lax.broadcasted_iota(jnp.int32, (rows + 1, LANES), 0)
                * LANES
                + lane
            )
            keep_run = (wpos >= col0) & (wpos < col0 + cnt.astype(jnp.int32))
            win[a] = jnp.where(keep_run, placed, w)
            wr = pltpu.make_async_copy(
                win.at[a], outs[a].at[pl.ds(row0, rows + 1)], sem.at[1]
            )
            wr.start()
            wr.wait()


def _reorder_pass(arrs, offs, *, bit, block_rows, interpret):
    """One LSD pass: split `arrs` (tuple of (rows,128) u32) by digit at `bit`."""
    n_arr = len(arrs)
    rows = arrs[0].shape[0]
    nblocks = rows // block_rows
    out_rows = rows + block_rows + 8  # slack for the last window
    outs = [jnp.zeros((out_rows, LANES), jnp.uint32) for _ in range(n_arr)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b, offs: (b, common.IM0))]
        * n_arr
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        scratch_shapes=[
            pltpu.VMEM((n_arr, block_rows + 1, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _reorder_kernel,
        n_arr=n_arr,
        rows=block_rows,
    )
    scalars = jnp.concatenate(
        [jnp.asarray([bit], jnp.int32), offs.reshape(-1).astype(jnp.int32)]
    )
    with common.i32_trace():
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32)
                for _ in range(n_arr)
            ],
            input_output_aliases={1 + n_arr + i: i for i in range(n_arr)},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(scalars, *arrs, *outs)
    return tuple(o[:rows] for o in out)


def sort_u32(mkeys, payloads=(), *, bit_count=32, block_rows=None,
             interpret=None, check_order=False, return_passes=False):
    """Stable ascending LSD radix sort of u32 keys (+ u32 payloads).

    The engine behind ``method='radix'``: bitCount/2 passes of
    histogram -> digit-major scan -> reorder, exactly the reference's pass
    structure (`AbstractRadixSortKernel.ts:94-107`). `bit` rides as a
    loop-carried scalar so every pass shares one compiled kernel pair.

    ``check_order=True`` reproduces the reference's *mid-sort* early exit
    (`AbstractRadixSortKernel.ts:249-276`): before every 2nd pass
    (``i % 2 == 0``, `:257`) the fast+full gated order check runs on the
    current working keys, and once they are sorted every remaining pass is
    skipped ("...or when it gets sorted before all the passes finishes",
    reference README "Order checking"). The GPU implements the skip by
    zeroing indirect-dispatch records; here the pass loop is a
    `lax.while_loop` whose carry holds the ``is_sorted`` verdict.

    ``return_passes=True`` additionally returns the number of passes that
    actually executed (instrumentation for tests/benchmarks).
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = mkeys.shape[0]
    block_rows = block_rows or DEFAULT_BLOCK_ROWS
    rows = common.round_up(max(n, 1), block_rows * LANES) // LANES
    # reorder-pass scalar offsets ride i32 SMEM words; make the (far-off)
    # representability ceiling explicit instead of silently wrapping
    assert rows * LANES < 2**31, (
        f"radix engine supports < 2^31 elements, got {rows * LANES} padded"
    )
    arrs = [common.pad_to(mkeys, rows * LANES, common.SENTINEL_U32)]
    arrs += [common.pad_to(p, rows * LANES, jnp.uint32(0)) for p in payloads]
    arrs = tuple(a.reshape(rows, LANES) for a in arrs)
    npasses = bit_count // RADIX_BITS

    def run_pass(arrs, bit):
        hist = digit_histogram(
            arrs[0], bit=bit, block_rows=block_rows, interpret=interpret
        )
        offs = bucket_offsets(hist, interpret=interpret)
        return _reorder_pass(
            arrs, offs, bit=bit, block_rows=block_rows, interpret=interpret
        )

    if not check_order:
        arrs = jax.lax.fori_loop(
            0,
            npasses,
            lambda i, a: run_pass(a, i * RADIX_BITS),
            arrs,
            unroll=False,
        )
        n_run = jnp.int32(npasses)
    else:
        # sentinel padding stays at the array tail at every pass boundary
        # (pad keys are all-ones: last digit run, stable order), so the
        # check can run over the padded working keys directly.
        def check_now(arrs):
            return checksort.is_sorted(arrs[0].reshape(-1), interpret=interpret)

        def cond(carry):
            _, i, done, _ = carry
            return (i < npasses) & ~done

        def body(carry):
            arrs, i, done, n_run = carry
            done = jax.lax.cond(
                i % CHECK_EVERY_PASSES == 0,
                lambda a: done | check_now(a),
                lambda a: done,
                arrs,
            )
            arrs = jax.lax.cond(
                done, lambda a: a, lambda a: run_pass(a, i * RADIX_BITS), arrs
            )
            n_run = n_run + jnp.where(done, 0, 1).astype(jnp.int32)
            return arrs, i + 1, done, n_run

        arrs, _, _, n_run = jax.lax.while_loop(
            cond, body, (arrs, jnp.int32(0), jnp.bool_(False), jnp.int32(0))
        )

    flat = tuple(a.reshape(rows * LANES)[:n] for a in arrs)
    if return_passes:
        return flat[0], flat[1:], n_run
    return flat[0], flat[1:]
