"""Blocked bitonic sorting-network engine (Pallas TPU kernels).

This is the single-chip workhorse of the framework. The reference's reorder
pass is a random global scatter (``src/shaders/RadixSortReorder.ts:101``),
which is fast on GPUs but element-serial on TPU (measured ~2 GB/s via XLA
scatter — see DESIGN.md). We therefore re-express all data-dependent movement
as a static-pattern compare-exchange network, executed wide on the VPU:

- the array lives as ``(rows, 128)`` u32 tiles, element ``i = row*128 + lane``
- a compare-exchange at stride ``j`` pairs ``i`` with ``i ^ j``: for
  ``j >= 128`` that is a sublane roll, for ``j < 128`` a lane roll — both are
  full-width vector ops; the data-dependent "swap" is a vector select
- stability (the reference's LSD sort is stable, ``README.md:94``) is
  recovered by tie-breaking on the original element index, which also makes
  the output bit-exact regardless of tile shape — the invariance the
  reference's tests assert by sweeping workgroup sizes
  (``example/tests.ts:19-28``)

Three launch shapes, one kernel body:

1. ``block sort``: grid over contiguous VMEM tiles of ``T`` elements; runs all
   stages ``k = 2..T``. After it, tiles are sorted in alternating directions —
   exactly the state of a bitonic sort after round ``T``.
2. ``fused cross-stage``: for merge-round ``k``, strides ``k/2 .. j_lo`` with
   ``2*j_lo > `` intra-tile reach are all handled in ONE pass by gathering,
   for each group of ``2^c`` half-groups, a ``sub``-row slice of each into one
   VMEM block via a free row-major reshape
   ``(A, 2^c, m_lo/sub, sub, 128)`` + BlockSpec indexing. Within the block,
   global stride ``j_lo * 2^s`` becomes local row stride ``sub * 2^s``. The
   direction bit of round ``k`` is constant per block (``a & 1``).
3. ``merge tail``: contiguous tiles again, strides ``T/2 .. 1`` of round ``k``.

Total HBM passes for n = 2^26 at T = 2^17: ~21 (vs ~350 for XLA's unblocked
`lax.sort`, which is why this engine is ~5-10x faster than the baseline).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common

LANES = 128
# Default per-array VMEM tile: 1024 rows * 128 lanes = 128K elements (512 KB).
DEFAULT_BLOCK_ROWS = 1024
# Fused cross-stage geometry: 2^CROSS_C half-groups x CROSS_SUB rows each.
CROSS_C = 6
CROSS_SUB = 8
# Compile cap: Mosaic's compile time/RSS grows superlinearly with the
# unrolled stage count × array count (past ~200 array-stages the remote
# compile helper gets OOM-killed). Runtime is flat in the chunk size
# (measured cap 8..64: ±2%), so chunk small for fast compiles; each chunk
# is an extra HBM round-trip (~0.2 ms/array-pass at 16M elements).
MAX_ARRAY_STAGES_PER_CALL = 48
# Sublane CE formulation: reshape+slice min/max (fewer VPU ops) vs cyclic
# rolls. Slicing sends Mosaic's compile time pathological on real TPU
# (4-D strided slices + stacks); rolls compile fast. Kept switchable for
# per-kernel microbenching (benchmarks/explore_stages.py).
USE_SLICING_CE = False
# Mosaic's default scoped-VMEM cap is 16 MB; a 3-array stable sort with
# 1024-row blocks needs ~16.5 MB of live stage temporaries. v5e has 128 MB
# of physical VMEM — raise the cap and leave headroom for double buffering.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024
# Bracket runs of lane-stride stages (j < 128) with in-VMEM transposes so
# they become sublane strides on the transposed view: lane rolls are the
# costliest CE primitive (DESIGN.md per-op table). Compiled-mode only
# (interpret emulation pays for the transposes); tests force it on via
# _TEST_TRANSPOSE_IN_INTERPRET to cover the path.
TRANSPOSE_LANE_STAGES = True
_TEST_TRANSPOSE_IN_INTERPRET = False
# Keys-only (unstable, 1-array) CE via signed min/max on a bias+direction
# XOR-ed view: out = where(first, min(y, fwd), max(y, bwd)) — drops the
# compare/XOR decision chain and the partner select. Valid keys-only
# because equal-key exchanges are byte no-ops; the direction mask is
# XOR-folded into the data once per round instead of entering each stage's
# decision (descending == ascending of ~y). Mosaic cannot legalize
# unsigned vector min (arith.minui, measured 2026-08-17), hence the
# 0x80000000 sign bias + i32 min/max.
USE_MINMAX_CE = True
# Stable 2-array (key, rank) CE via the same XOR-fold: direction is folded
# into BOTH arrays (complementing the rank flips tie order together with the
# key order, so descending-by-tuple == ascending-by-complemented-tuple). The
# key output then needs no decision chain at all — min via the fwd roll at
# first slots, max via the bwd roll at second slots — and only the rank pays
# a lexicographic compare per roll direction. Candidate from round-3 VERDICT
# item 6 (benchmarks/explore_ce.py `fold2minmax` row). MEASURED DEAD END
# (on-chip A/B 2026-08-18): 106.8 vs 102.3 us/stage baseline — the rank's
# per-roll-direction lexicographic compare costs more than the dropped key
# decision chain saves. Stays OFF; byte-exactness pinned either way by
# tests/test_sort.py::test_fold2_stable_path.
USE_FOLD2_CE = False
# The same fold for >= 3 arrays (generic k+v, masked keys, 64-bit stable):
# every KEY column XORs the direction mask (payloads don't — they aren't
# compared), the leading column's CE is pure min/max, lower key columns and
# payloads select on one lexicographic verdict per roll direction.
# Candidate from the explore_ce `fold3minmax` row; gated separately from
# USE_FOLD2_CE because the win need not transfer (payload columns pay one
# extra select each). MEASURED DEAD END too (2026-08-18): 141.2 vs
# 132.1 us/stage baseline. Stays OFF; byte-exactness pinned by
# tests/test_sort.py::test_fold2_stable_path (foldn cases).
USE_FOLD3_CE = False


def _roll(x, shift, axis):
    """Cyclic roll; out[i] = x[(i - shift) mod n] along axis."""
    return pltpu.roll(x, common.roll_shift_i32(shift % x.shape[axis]),
                      axis=axis)


def _lex_lt(a_cols, b_cols):
    """Strict lexicographic less-than over parallel column tuples.

    One column: plain compare. k columns: 3 extra vector ops per column,
    chained from the least-significant column up. This is how 64-bit keys
    ride the u32 engine — as (hi, lo[, tie]) column tuples — and how the
    stability tie-break has always worked ((key, idx) is the 2-column case).
    """
    lt = a_cols[-1] < b_cols[-1]
    for a, b in zip(reversed(a_cols[:-1]), reversed(b_cols[:-1])):
        lt = (a < b) | ((a == b) & lt)
    return lt


def _ce_sublane(arrs, n_keys, distinct, up, j, kernel_rows):
    """Compare-exchange at sublane stride j >= 128 via reshape + slicing.

    View (R, 128) as (G, 2, m, 128) with m = j/128: pair halves are the
    axis-1 slices — contiguous sublane slices, so the exchange is pure
    min/max-style selects with no rolls, no partner masks. `up` is a scalar
    bool or a (G, 1, 1) mask (direction constant within a pair group because
    k >= 2j). `n_keys` leading arrays form the lexicographic compare tuple;
    `distinct` promises equal tuples are byte-identical across ALL arrays
    (so their exchanges need no three-way decision).
    """
    m = j // LANES
    g = kernel_rows // (2 * m)
    r4 = tuple(a.reshape(g, 2, m, LANES) for a in arrs)
    x0 = tuple(r[:, 0] for r in r4)
    x1 = tuple(r[:, 1] for r in r4)
    lt10 = _lex_lt(x1[:n_keys], x0[:n_keys])
    if distinct:
        # distinct (or byte-identical) tuples: lt01 == ~lt10 up to no-ops
        swap = (up & lt10) | (~up & ~lt10)
    else:
        lt01 = _lex_lt(x0[:n_keys], x1[:n_keys])
        swap = (up & lt10) | (~up & lt01)
    new0 = tuple(jnp.where(swap, b, a) for a, b in zip(x0, x1))
    new1 = tuple(jnp.where(swap, a, b) for a, b in zip(x0, x1))
    return tuple(
        jnp.stack([a, b], axis=1).reshape(kernel_rows, LANES)
        for a, b in zip(new0, new1)
    )


def _ce_roll(arrs, n_keys, distinct, up, j, rid, cid):
    """Compare-exchange at stride j via cyclic rolls (any j).

    partner[i] = x[i ^ j]: one fwd and one bwd roll selected by the pair-bit
    mask — a sublane roll for j >= 128, a lane roll below. `up` is a scalar
    bool or full-shape mask. rid/cid are hoisted row/lane iotas. `n_keys`
    leading arrays form the lexicographic compare tuple; `distinct` as in
    :func:`_ce_sublane`.
    """
    if j >= LANES:
        m = j // LANES
        first = (rid & m) == 0  # bit m of row clear -> partner is +m rows
        # partner[r] = x[r ^ m]. NOTE: within each group of 2m rows this is
        # a grouped cyclic roll — reshape (R,C)->(R/2m,2m,C), roll axis=1 by
        # m — which is 1 roll instead of 2 rolls + select. Measured on v5e:
        # Mosaic lowers the 3-D roll ~2.6x SLOWER than the pair below
        # (4M k+v 6.2 -> 16.0 ms), so the two-roll form stays.
        partners = tuple(
            jnp.where(first, _roll(a, -m, 0), _roll(a, m, 0)) for a in arrs
        )
    else:
        first = (cid & j) == 0
        partners = tuple(
            jnp.where(first, _roll(a, -j, 1), _roll(a, j, 1)) for a in arrs
        )
    # take partner's tuple iff (first == up) ? p<e : p>e. Expressed as XOR
    # chains (Mosaic cannot lower i1 == i1; XOR is the cheap equivalent).
    diff = first ^ up
    p_lt_e = _lex_lt(partners[:n_keys], arrs[:n_keys])
    if distinct:
        # tuples are distinct (or equal tuples are byte-identical, so their
        # exchange is a no-op): p>e == !(p<e) and a single lexicographic
        # compare feeds the whole decision: take = first ^ up ^ (p<e).
        # (The select form `where(eq, idx-lt, key-lt)` would be one op
        # fewer, but Mosaic cannot lower an i1-valued select: "Unsupported
        # target bitwidth for truncation" i8->i1, measured 2026-08-16.)
        take_partner = diff ^ p_lt_e
    else:
        # equal keys with co-moving payloads: neither side moves
        p_gt_e = _lex_lt(arrs[:n_keys], partners[:n_keys])
        take_partner = (p_lt_e & ~diff) | (p_gt_e & diff)
    return tuple(jnp.where(take_partner, p, e) for e, p in zip(arrs, partners))


def _ce_roll_minmax(y, j, rid, cid):
    """Keys-only CE at stride j on the XOR-folded view y (see USE_MINMAX_CE).

    y's byte order is already "ascending everywhere" (direction and sign
    bias XOR-folded upstream), so the exchange is a pure signed min/max:
    the first element of each pair keeps min(pair) via the forward roll,
    the second keeps max(pair) via the backward roll — no partner select,
    no compare chain. Garbage lanes of each roll land only on positions
    whose select branch ignores them.
    """
    yi = jax.lax.bitcast_convert_type(y, jnp.int32)
    if j >= LANES:
        m = j // LANES
        first = (rid & m) == 0
        fwd = _roll(yi, -m, 0)
        bwd = _roll(yi, m, 0)
    else:
        first = (cid & j) == 0
        fwd = _roll(yi, -j, 1)
        bwd = _roll(yi, j, 1)
    out = jnp.where(first, jnp.minimum(yi, fwd), jnp.maximum(yi, bwd))
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def _ce_roll_foldn(arrs, n_keys, j, rid, cid):
    """CE at stride j on direction-folded views (the fold2/fold3 fast path).

    The leading `n_keys` arrays are the compare tuple, pre-XORed with the
    round's direction mask (plus the i32 sign bias on the top column only),
    so tuple order is "ascending everywhere": the top column keeps
    min(pair) at first slots via the forward roll and max(pair) at second
    slots via the backward roll with no decision chain; every other array
    (lower key columns AND payloads) selects on one lexicographic verdict
    per roll direction. Garbage lanes of each roll land only on positions
    whose select branch ignores them (same argument as
    :func:`_ce_roll_minmax`).
    """
    y = jax.lax.bitcast_convert_type(arrs[0], jnp.int32)
    rest = arrs[1:]
    if j >= LANES:
        m = j // LANES
        first = (rid & m) == 0
        axis, sh = 0, m
    else:
        first = (cid & j) == 0
        axis, sh = 1, j
    yf, yb = _roll(y, -sh, axis), _roll(y, sh, axis)
    rf = tuple(_roll(a, -sh, axis) for a in rest)
    rb = tuple(_roll(a, sh, axis) for a in rest)
    out_y = jnp.where(first, jnp.minimum(y, yf), jnp.maximum(y, yb))
    ks = n_keys - 1  # lower key columns among `rest`
    tl_f = _lex_lt((yf, *rf[:ks]), (y, *rest[:ks]))  # fwd partner tuple-less
    tl_b = _lex_lt((yb, *rb[:ks]), (y, *rest[:ks]))  # bwd partner tuple-less
    out_rest = tuple(
        jnp.where(
            first,
            jnp.where(tl_f, f, a),  # first slot keeps the tuple-min's row
            jnp.where(tl_b, a, b),  # second slot keeps the tuple-max's row
        )
        for a, f, b in zip(rest, rf, rb)
    )
    return (jax.lax.bitcast_convert_type(out_y, jnp.uint32), *out_rest)


def _stages_kernel(refs, *, n_arr, n_keys, distinct, stages, base_scale,
                   kernel_rows, dyn_k, transpose_lanes=True):
    """Run `stages` = [(k, j_local)] on one VMEM block of (kernel_rows, 128).

    Direction for stage (k, j): up(i) = ((base + local) & k) == 0 — the exact
    bitonic direction bit of the element's global index, where
    base = program_id(0) * base_scale. `k` per stage is either a static int
    or None, meaning "read the round from the scalar operand" (dyn_k): merge
    rounds differ ONLY in k, so passing it as data lets every round reuse one
    compiled kernel instead of compiling log2(n/T) distinct ones.
    """
    if dyn_k:
        k_ref = refs[0]
        refs = refs[1:]
    ins = refs[:n_arr]
    outs = refs[n_arr:]
    base = pl.program_id(0) * base_scale
    arrs = tuple(r[:].reshape(kernel_rows, LANES) for r in ins)
    # keys-only fast path: fold sign bias + per-round direction into the
    # data by XOR and run every CE as signed min/max (see USE_MINMAX_CE)
    fast = USE_MINMAX_CE and n_keys == 1 and n_arr == 1
    # folded multi-column fast path — stable (key, rank), keys-only 64-bit
    # (hi, lo), or any distinct tuple with payloads: fold direction into
    # every KEY column so the leading column's CE is pure min/max and the
    # rest select on one lexicographic verdict per roll direction
    fast2 = distinct and n_keys >= 2 and (
        USE_FOLD2_CE if n_arr == 2 else USE_FOLD3_CE
    )
    shape = (kernel_rows, LANES)
    # hoist the index planes: one iota pair per kernel, not per stage
    rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    local = rid * LANES + cid  # base-free: bits below the block span
    # transposed view (LANES, kernel_rows): lane strides become sublane.
    # rid_t = original lane, cid_t = original row; local index unchanged.
    shape_t = (LANES, kernel_rows)
    rid_t = jax.lax.broadcasted_iota(jnp.int32, shape_t, 0)
    cid_t = jax.lax.broadcasted_iota(jnp.int32, shape_t, 1)
    local_t = cid_t * LANES + rid_t
    span = kernel_rows * LANES
    transposed = False

    def direction(k, tr):
        if k is None:
            # dynamic k is only used for merge rounds, where k >= the
            # block span: the direction bit is constant per block.
            return (base & k_ref[0]) == 0
        if k < span:
            # base is a multiple of the span, so (base & k) == 0: the
            # direction is a compile-time-constant mask (no traced base).
            return ((local_t if tr else local) & k) == 0
        return (base & k) == 0  # scalar

    def dm32(k, tr):
        """Direction as a XOR mask: 0 where ascending, ~0 where descending
        (descending order == ascending order of the bitwise complement)."""
        u = direction(k, tr)
        return jnp.asarray(u, jnp.uint32) - jnp.uint32(1)

    _unset = object()
    up = None
    prev = (_unset, False)
    for k, j in stages:
        is_lane = j < LANES
        want_t = transpose_lanes and is_lane and kernel_rows > 1
        if want_t != transposed:
            arrs = tuple(jnp.transpose(a) for a in arrs)
            transposed = want_t
        if (k, transposed) != prev:  # direction mask is per round
            if fast or fast2:
                # re-fold the data to the new round's direction (+ the i32
                # sign bias on the key on entry); a transpose-only change
                # needs nothing (the folded state rides the transpose)
                tgt = dm32(k, transposed)
                if prev[0] is _unset:
                    dk = jnp.uint32(0x80000000) ^ tgt
                    ds = tgt
                elif k != prev[0]:
                    dk = ds = dm32(prev[0], transposed) ^ tgt
                else:
                    dk = ds = None
                if dk is not None:
                    if fast:
                        arrs = (arrs[0] ^ dk,)
                    else:
                        # top key column carries the bias; the other KEY
                        # columns fold the direction mask; payloads don't
                        arrs = (
                            arrs[0] ^ dk,
                            *(a ^ ds for a in arrs[1:n_keys]),
                            *arrs[n_keys:],
                        )
            else:
                up = direction(k, transposed)
            prev = (k, transposed)
        if fast:
            jj = j * LANES if transposed else j
            arrs = (_ce_roll_minmax(
                arrs[0], jj, rid_t if transposed else rid,
                cid_t if transposed else cid),)
        elif fast2:
            jj = j * LANES if transposed else j
            arrs = _ce_roll_foldn(
                arrs, n_keys, jj, rid_t if transposed else rid,
                cid_t if transposed else cid)
        elif transposed:
            # lane stride j -> sublane stride of j rows on the transposed
            # view; first-mask bit j now lives in rid_t
            arrs = _ce_roll(arrs, n_keys, distinct, up, j * LANES, rid_t, cid_t)
        elif k is not None and j >= LANES and USE_SLICING_CE:
            # slicing CE wants a (G,1,1) direction mask (constant per pair
            # group since k >= 2j), not the full-shape one
            g = kernel_rows * LANES // (2 * j)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1), 0)
            up_g = ((base + g_iota * (2 * j)) & k) == 0
            arrs = _ce_sublane(arrs, n_keys, distinct, up_g, j, kernel_rows)
        else:
            arrs = _ce_roll(arrs, n_keys, distinct, up, j, rid, cid)
    if transposed:
        arrs = tuple(jnp.transpose(a) for a in arrs)
    if fast and prev[0] is not _unset:
        # unfold: remove the sign bias + the last round's direction mask
        # (in the untransposed orientation)
        arrs = (arrs[0] ^ (jnp.uint32(0x80000000) ^ dm32(prev[0], False)),)
    elif fast2 and prev[0] is not _unset:
        m_last = dm32(prev[0], False)
        arrs = (
            arrs[0] ^ (jnp.uint32(0x80000000) ^ m_last),
            *(a ^ m_last for a in arrs[1:n_keys]),
            *arrs[n_keys:],
        )
    for o, a in zip(outs, arrs):
        o[:] = a.reshape(o.shape)


def _run_network(arrs, stable, stages, *, grid, block_shape, index_map, base_scale,
                 kernel_rows, block_elems, interpret, dyn_k=None, n_keys=None):
    del block_elems  # direction now uses the exact global-index formula
    n_arr = len(arrs)
    if n_keys is None:
        n_keys = 2 if stable else 1  # (key, idx-tie) vs plain key
    # equal compare-tuples are byte-identical when every array is in the
    # tuple (keys-only, incl. multi-column 64-bit keys) or when `stable`
    # promises distinct tuples — either way no three-way decision is needed
    distinct = stable or n_keys == n_arr
    per_call = max(8, MAX_ARRAY_STAGES_PER_CALL // n_arr)
    if len(stages) > per_call:
        for i in range(0, len(stages), per_call):
            arrs = _run_network(
                arrs, stable, stages[i : i + per_call],
                grid=grid, block_shape=block_shape, index_map=index_map,
                base_scale=base_scale, kernel_rows=kernel_rows,
                block_elems=None, interpret=interpret, dyn_k=dyn_k,
                n_keys=n_keys,
            )
        return arrs
    kern = functools.partial(
        _stages_kernel,
        n_arr=n_arr,
        n_keys=n_keys,
        distinct=distinct,
        stages=stages,
        base_scale=base_scale,
        kernel_rows=kernel_rows,
        dyn_k=dyn_k is not None,
        # a compiled-mode perf win (fused by Mosaic); in interpret mode the
        # extra transposes just slow the Python emulation ~2x
        transpose_lanes=TRANSPOSE_LANE_STAGES
        and (not interpret or _TEST_TRANSPOSE_IN_INTERPRET),
    )
    spec = pl.BlockSpec(block_shape, index_map)
    in_specs = [spec] * n_arr
    operands = list(arrs)
    grid_rank = len(grid)
    if dyn_k is not None:
        smem_spec = pl.BlockSpec(
            (1,), lambda *_: (common.IM0,), memory_space=pltpu.SMEM
        )
        in_specs = [smem_spec] + in_specs
        operands = [jnp.full((1,), dyn_k, dtype=jnp.int32)] + operands
        io_alias = {1 + i: i for i in range(n_arr)}
    else:
        io_alias = {i: i for i in range(n_arr)}
    del grid_rank
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        )
    with common.i32_trace():
        out = pl.pallas_call(
            lambda *refs: kern(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=[spec] * n_arr,
            out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs],
            input_output_aliases=io_alias,
            interpret=interpret,
            **kwargs,
        )(*operands)
    return tuple(out)


def _block_stages(k_lo, k_hi, j_hi_of_k=None):
    """Stage list [(k, j)] for rounds k = k_lo..k_hi, strides k/2..1."""
    stages = []
    k = k_lo
    while k <= k_hi:
        j = k // 2 if j_hi_of_k is None else j_hi_of_k(k)
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def sort_padded(arrs, *, stable, block_rows=None, interpret=None,
                n_keys=None):
    """Sort tuple of u32 arrays lexicographically by the leading `n_keys`
    columns, ascending (default n_keys: 2 when `stable` — (key, tie) — else
    1). Multi-word keys (e.g. 64-bit as (hi, lo)) are extra key columns.

    Arrays must be 1-D u32 of identical power-of-two length >= 128 (pad with
    0xFFFFFFFF sentinels upstream; they sort to the tail). Returns the arrays
    co-permuted. When `stable`, the last key column is the tie-break: real
    elements' key tuples must be pairwise distinct (e.g. a unique index
    or a strictly-increasing rank payload). Elements sharing a full key
    tuple are allowed ONLY if they are identical across ALL arrays (e.g.
    sentinel pads, or keys-only sorts where the tuple IS the data) —
    equal-tuple exchanges then resolve arbitrarily but are byte no-ops
    (the rank-payload path in ops/sort.py relies on this).
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = arrs[0].shape[0]
    assert n >= LANES and (n & (n - 1)) == 0, f"padded length must be pow2 >= 128, got {n}"
    rows = n // LANES
    if block_rows is None:
        from ..utils import dispatch

        block_rows = min(
            DEFAULT_BLOCK_ROWS, dispatch.choose_block_rows(n, len(arrs))
        )
    tile_rows = min(rows, block_rows)
    T = tile_rows * LANES

    x = tuple(a.reshape(rows, LANES) for a in arrs)
    n_arr = len(x)

    def run_contig(x, stages, dyn_k=None):
        return _run_network(
            x, stable, stages,
            grid=(rows // tile_rows,),
            block_shape=(tile_rows, LANES),
            index_map=lambda i: (i, common.IM0),
            base_scale=T,
            kernel_rows=tile_rows,
            block_elems=T,
            interpret=interpret,
            dyn_k=dyn_k,
            n_keys=n_keys,
        )

    # Phase 1: fully sort each tile (alternating directions via the global
    # direction bit of each round).
    x = run_contig(x, _block_stages(2, T))

    # Phase 2: bitonic merge rounds k = 2T .. n.
    k = 2 * T
    while k <= n:
        x = _merge_round(
            x, k, n=n, rows=rows, tile_rows=tile_rows, T=T,
            stable=stable, run_contig=run_contig, interpret=interpret,
            n_keys=n_keys,
        )
        k *= 2

    return tuple(a.reshape(n) for a in x)


def _merge_round(x, k, *, n, rows, tile_rows, T, stable, run_contig, interpret,
                 n_keys=None, j_hi=None):
    """One bitonic merge round k: strides k/2 .. 1 over (rows, 128) arrays.

    The round constant k is passed to the kernels as a scalar operand
    (dyn_k), so all rounds with the same stride structure share one compiled
    Mosaic kernel — compile time is O(1) in the number of merge rounds.
    `j_hi` overrides the starting stride (default k/2) — the row-local
    final round passes a k larger than every global index (direction
    uniformly ascending) with strides bounded by the row length.
    """
    # strides k/2 .. down: fused cross passes while the pair distance
    # exceeds what a contiguous tile can see (2j > T)
    j = k // 2 if j_hi is None else j_hi
    while 2 * j > T:
        # fuse strides j .. j_lo in one pass (c of them)
        c = 1
        j_lo = j
        while (
            c < CROSS_C
            and 2 * (j_lo // 2) > T
            and j_lo // 2 >= CROSS_SUB * LANES
            and (1 << (c + 1)) * CROSS_SUB * LANES <= T
        ):
            c += 1
            j_lo //= 2
        m_lo = j_lo // LANES
        sub = min(CROSS_SUB, m_lo)
        group = (1 << c) * j_lo  # == elements spanned by one exchange group
        A = n // group
        x4 = tuple(a.reshape(A, 1 << c, m_lo // sub, sub, LANES) for a in x)
        # local strides: global j_lo * 2^s  <->  local rows sub * 2^s
        stages = [(None, sub * (1 << s) * LANES) for s in range(c - 1, -1, -1)]
        kernel_rows = (1 << c) * sub
        x4 = _run_network(
            x4, stable, stages,
            grid=(A, m_lo // sub),
            block_shape=(1, 1 << c, 1, sub, LANES),
            index_map=lambda a, s: (a, common.IM0, s, common.IM0, common.IM0),
            base_scale=group,
            kernel_rows=kernel_rows,
            block_elems=kernel_rows * LANES,
            interpret=interpret,
            dyn_k=k,
            n_keys=n_keys,
        )
        x = tuple(a.reshape(rows, LANES) for a in x4)
        j = j_lo // 2
    # merge tail: strides j .. 1 inside contiguous tiles
    if j >= 1:
        x = run_contig(x, [(None, jj) for jj in _halving(j)], dyn_k=k)
    return x


def sort_rows_padded(arrs, *, row_len, stable, block_rows=None,
                     interpret=None, n_keys=None):
    """Sort every aligned `row_len` run of the arrays independently,
    ascending (the batched per-row engine, `ops/batched.py`).

    Same column contract as :func:`sort_padded` (key columns + optional
    tie + payloads, sentinel pads per row), but the network stops at the
    row length: rounds 2 .. row_len/2 are the standard bitonic rounds
    (strides never cross a row because row_len divides every round's run
    length), and one final merge round runs strides row_len/2 .. 1 with
    the direction forced uniformly ascending (each row is bitonic after
    round row_len/2, and the final merge direction is free per row). Total
    stages: O(log^2 row_len) + log row_len — the per-row optimum —
    instead of O(log^2 (B*row_len)) for a composite (row, key) sort, with
    no row-id column moved at all.

    `arrs` length must be a multiple of `row_len` (pow2); the total length
    need not be a power of two.
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = arrs[0].shape[0]
    assert row_len >= 2 and (row_len & (row_len - 1)) == 0, (
        f"row_len must be a pow2 >= 2, got {row_len}"
    )
    assert n % row_len == 0 and n % LANES == 0, (
        f"length {n} must be a multiple of row_len {row_len} and {LANES}"
    )
    rows = n // LANES
    if block_rows is None:
        from ..utils import dispatch

        block_rows = min(
            DEFAULT_BLOCK_ROWS, dispatch.choose_block_rows(n, len(arrs))
        )
    tile_rows = min(rows, block_rows)
    # tiles must not straddle row boundaries when rows span multiple tiles
    if row_len > LANES:
        tile_rows = min(tile_rows, row_len // LANES)
    # the grid needs tile_rows | rows (rows = B * row_len/LANES need not be
    # a pow2 when the batch count isn't)
    while rows % tile_rows:
        tile_rows //= 2
    T = tile_rows * LANES

    x = tuple(a.reshape(rows, LANES) for a in arrs)

    def run_contig(x, stages, dyn_k=None):
        return _run_network(
            x, stable, stages,
            grid=(rows // tile_rows,),
            block_shape=(tile_rows, LANES),
            index_map=lambda i: (i, common.IM0),
            base_scale=T,
            kernel_rows=tile_rows,
            block_elems=T,
            interpret=interpret,
            dyn_k=dyn_k,
            n_keys=n_keys,
        )

    # a pow2 k with (global_idx & k) == 0 everywhere: uniformly ascending
    BIG = 1 << 30
    assert n < BIG

    if row_len <= T:
        # whole rows fit a tile: standard rounds + the uniform final round
        # in (chunked) contiguous calls
        stages = _block_stages(2, row_len // 2) if row_len >= 4 else []
        stages += [(BIG, j) for j in _halving(row_len // 2)]
        x = run_contig(x, stages)
        return tuple(a.reshape(n) for a in x)

    # rows span multiple tiles: phase 1 over tiles, merge rounds up to
    # row_len/2, then the final uniform round with strides row_len/2 .. 1
    x = run_contig(x, _block_stages(2, T))
    k = 2 * T
    while k <= row_len // 2:
        x = _merge_round(
            x, k, n=n, rows=rows, tile_rows=tile_rows, T=T,
            stable=stable, run_contig=run_contig, interpret=interpret,
            n_keys=n_keys,
        )
        k *= 2
    x = _merge_round(
        x, BIG, n=n, rows=rows, tile_rows=tile_rows, T=T,
        stable=stable, run_contig=run_contig, interpret=interpret,
        n_keys=n_keys, j_hi=row_len // 2,
    )
    return tuple(a.reshape(n) for a in x)


def merge_padded(arrs, *, stable, block_rows=None, interpret=None,
                 n_keys=None):
    """Sort a *bitonic* tuple of u32 arrays ascending (one bitonic merge).

    Same contract as :func:`sort_padded` but the input key tuple (leading
    `n_keys` columns) must already form a bitonic sequence — e.g. the
    min/max halves of a compare-split between two sorted shards (see
    ``parallel/mesh_sort.py``). Runs only the merge network: strides n/2..1,
    uniformly ascending — log2(n) compare-exchange stages instead of the full
    O(log^2 n) sort.
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = arrs[0].shape[0]
    assert n >= LANES and (n & (n - 1)) == 0, f"padded length must be pow2 >= 128, got {n}"
    rows = n // LANES
    if block_rows is None:
        from ..utils import dispatch

        block_rows = min(
            DEFAULT_BLOCK_ROWS, dispatch.choose_block_rows(n, len(arrs))
        )
    tile_rows = min(rows, block_rows)
    T = tile_rows * LANES

    x = tuple(a.reshape(rows, LANES) for a in arrs)

    def run_contig(x, stages, dyn_k=None):
        return _run_network(
            x, stable, stages,
            grid=(rows // tile_rows,),
            block_shape=(tile_rows, LANES),
            index_map=lambda i: (i, common.IM0),
            base_scale=T,
            kernel_rows=tile_rows,
            block_elems=T,
            interpret=interpret,
            dyn_k=dyn_k,
            n_keys=n_keys,
        )

    # Round k = n: every local index i < n has (i & n) == 0, so the direction
    # is uniformly ascending — exactly a bitonic merge.
    x = _merge_round(
        x, n, n=n, rows=rows, tile_rows=tile_rows, T=T,
        stable=stable, run_contig=run_contig, interpret=interpret,
        n_keys=n_keys,
    )
    return tuple(a.reshape(n) for a in x)


def merge_tree_padded(arrs, *, run, stable, block_rows=None, interpret=None,
                      n_keys=None):
    """Complete a bitonic sort whose rounds k <= `run` are already done.

    Input: pow2-length u32 arrays (same contract as :func:`sort_padded`)
    consisting of n/run runs of `run` elements, each sorted by
    (arrs[0][, arrs[1]]) in the alternating directions of a bitonic sort
    after round k=run — run j ascending iff j is even. Runs the remaining
    merge rounds k = 2*run .. n: log2(n/run) rounds instead of the full
    O(log^2 n) network. This is the D-way merge used by the distributed
    exchange's phase 4 (D received sorted chunks in slots; see
    ``parallel/radix_exchange.py``): with run == n/2 it coincides with
    :func:`merge_padded` on [A ascending ++ B descending].
    """
    if interpret is None:
        interpret = common.default_interpret()
    n = arrs[0].shape[0]
    assert n >= LANES and (n & (n - 1)) == 0, f"padded length must be pow2 >= 128, got {n}"
    assert run >= 1 and (run & (run - 1)) == 0 and n % run == 0, (
        f"run must be a pow2 dividing n, got {run} / {n}"
    )
    if run >= n:
        return tuple(arrs)
    rows = n // LANES
    if block_rows is None:
        from ..utils import dispatch

        block_rows = min(
            DEFAULT_BLOCK_ROWS, dispatch.choose_block_rows(n, len(arrs))
        )
    tile_rows = min(rows, block_rows)
    T = tile_rows * LANES

    x = tuple(a.reshape(rows, LANES) for a in arrs)

    def run_contig(x, stages, dyn_k=None):
        return _run_network(
            x, stable, stages,
            grid=(rows // tile_rows,),
            block_shape=(tile_rows, LANES),
            index_map=lambda i: (i, common.IM0),
            base_scale=T,
            kernel_rows=tile_rows,
            block_elems=T,
            interpret=interpret,
            dyn_k=dyn_k,
            n_keys=n_keys,
        )

    # rounds k <= T are intra-tile (max stride k/2 < T, segments align within
    # tiles): run them as static stages in one chunked call, exactly like
    # sort_padded's phase 1 — the dyn-k path needs k >= the block span.
    k = 2 * run
    if k <= T:
        x = run_contig(x, _block_stages(k, T))
        k = 2 * T
    while k <= n:
        x = _merge_round(
            x, k, n=n, rows=rows, tile_rows=tile_rows, T=T,
            stable=stable, run_contig=run_contig, interpret=interpret,
            n_keys=n_keys,
        )
        k *= 2
    return tuple(a.reshape(n) for a in x)


def _halving(j):
    out = []
    while j >= 1:
        out.append(j)
        j //= 2
    return out
