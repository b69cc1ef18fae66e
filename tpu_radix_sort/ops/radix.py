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
(`ops/bitonic.py`) is ~2-3x faster (DESIGN.md cost model: the compaction
costs ~1k VPU ops/elt/pass); this engine exists for pipeline parity (the
reference's algorithm, selectable via ``method='radix'``) and because its
histogram/offset kernels are the building blocks of the distributed radix
exchange (SURVEY.md §7). The reference ships its own alternate code paths
disabled-by-default the same way (`README.md:124-168`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common, scan

LANES = 128
DEFAULT_BLOCK_ROWS = 512
RADIX_BITS = 2
R = 1 << RADIX_BITS  # 4-way, reference-faithful (src/shaders/RadixSort.ts:61)


# ---------------------------------------------------------------- histogram


def _hist_kernel(x_ref, o_ref, *, bit, rows):
    # counts are scalars: write them through SMEM (a (R, 1) VMEM block would
    # violate the (8, 128) tiling minimum of the Mosaic lowering)
    b = pl.program_id(0)
    dig = (x_ref[:] >> jnp.uint32(bit)) & jnp.uint32(R - 1)
    for r in range(R):
        # Mosaic has no unsigned reductions: sum in i32, store as u32
        o_ref[r, b] = jnp.sum((dig == r).astype(jnp.int32)).astype(jnp.uint32)


def digit_histogram(u, *, bit, block_rows=None, interpret=None):
    """Digit-major [R, nblocks] histogram of 2-bit digits at `bit`.

    `u` must be (nblocks*block_rows, 128) u32 (pad upstream with sentinels).
    """
    if interpret is None:
        interpret = common.default_interpret()
    rows = u.shape[0]
    block_rows = min(rows, block_rows or DEFAULT_BLOCK_ROWS)
    nblocks = rows // block_rows
    return pl.pallas_call(
        functools.partial(_hist_kernel, bit=bit, rows=block_rows),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((R, nblocks), jnp.uint32),
        interpret=interpret,
    )(u)


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


def _reorder_kernel(offs_ref, *refs, n_arr, bit, rows, out_pad_rows):
    """One block: 4-way stable split in VMEM + window-DMA runs to HBM.

    refs = in VMEM blocks (n_arr) | aliased HBM operands (n_arr, unused) |
           out HBM refs (n_arr) | scratch: win (n_arr, rows+1, 128) | sem (2,)
    """
    b = pl.program_id(0)
    ins = refs[:n_arr]
    outs = refs[2 * n_arr : 3 * n_arr]  # aliased with operands n_arr..2n_arr
    win = refs[3 * n_arr]
    sem = refs[3 * n_arr + 1]

    key = ins[0][:]
    dig = (key >> jnp.uint32(bit)) & jnp.uint32(R - 1)
    shape = (rows, LANES)
    rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = rid * LANES + cid
    n_local = rows * LANES

    data0 = tuple(rf[:] for rf in ins)
    for r in range(R):
        mask = dig == r
        mask_u = mask.astype(jnp.uint32)
        inc = _cumsum_mask(mask_u, rows)
        cnt = inc[rows - 1, LANES - 1]
        # deficit: how far left each kept element must travel (= non-r
        # elements before it). LSB-first shifting by its bits is
        # collision-free (DESIGN.md).
        deficit = (jnp.asarray(idx, jnp.uint32) - (inc - mask_u)) * mask_u
        # masks stay u32 0/1: Mosaic cannot roll i1 vectors
        kept_u = mask_u
        d = deficit
        data = data0
        s = 1
        log_s = 0
        while s < n_local:
            mv_u = kept_u * ((d >> jnp.uint32(log_s)) & jnp.uint32(1))

            if s >= LANES:
                # whole-row shift: no lane boundary crossing
                m = (s // LANES) % rows
                shl = lambda a: pltpu.roll(a, (-m) % rows, axis=0)
            else:
                # row-major left shift by s < 128 crosses row boundaries:
                # lanes >= 128-s pull from the next row
                def shl(a, _s=s):
                    r1 = pltpu.roll(a, (-_s) % LANES, axis=1)
                    r2 = pltpu.roll(r1, (rows - 1) % rows, axis=0)
                    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                    return jnp.where(lane < LANES - _s, r1, r2)

            arrived_u = shl(mv_u)
            arrived = arrived_u == 1
            data = tuple(jnp.where(arrived, shl(a), a) for a in data)
            d = jnp.where(arrived, shl(d), d)
            kept_u = arrived_u | (kept_u & (jnp.uint32(1) - mv_u))
            s *= 2
            log_s += 1
        # runs now left-packed in `data`[:cnt]; window read-merge-write
        off = offs_ref[r * pl.num_programs(0) + b]
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
            shifted = pltpu.roll(src, col0 % LANES, axis=1)
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
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b, offs: (b, 0))]
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
        bit=bit,
        rows=block_rows,
        out_pad_rows=out_rows,
    )
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
    )(offs.reshape(-1).astype(jnp.int32), *arrs, *outs)
    return tuple(o[:rows] for o in out)


def sort_u32(mkeys, payloads=(), *, bit_count=32, block_rows=None,
             interpret=None):
    """Stable ascending LSD radix sort of u32 keys (+ u32 payloads).

    The engine behind ``method='radix'``: bitCount/2 passes of
    histogram -> digit-major scan -> reorder, exactly the reference's pass
    structure (`AbstractRadixSortKernel.ts:94-107`).
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = mkeys.shape[0]
    block_rows = block_rows or DEFAULT_BLOCK_ROWS
    rows = common.round_up(max(n, 1), block_rows * LANES) // LANES
    arrs = [common.pad_to(mkeys, rows * LANES, common.SENTINEL_U32)]
    arrs += [common.pad_to(p, rows * LANES, jnp.uint32(0)) for p in payloads]
    arrs = tuple(a.reshape(rows, LANES) for a in arrs)

    for bit in range(0, bit_count, RADIX_BITS):
        hist = digit_histogram(
            arrs[0], bit=bit, block_rows=block_rows, interpret=interpret
        )
        offs = bucket_offsets(hist, interpret=interpret)
        arrs = _reorder_pass(
            arrs, offs, bit=bit, block_rows=block_rows, interpret=interpret
        )

    flat = tuple(a.reshape(rows * LANES)[:n] for a in arrs)
    return flat[0], flat[1:]
