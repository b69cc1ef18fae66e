"""Segmented sorts: independently sort variable-length segments of a flat
array (the ragged generalization of `ops/batched.py`).

Extension past the reference. Segments are defined CSR-style by an
`offsets` array (length S+1, offsets[0] == 0, offsets[-1] == n,
nondecreasing; empty segments allowed). Unlike equal-length rows, ragged
segments don't align to the row-local network's pow2 runs, so the engine
here is a *composite key*: sorting the flat array by (segment_id, key)
lexicographically sorts every segment in place — segment id dominates, so
elements never leave their segment's contiguous range, and within it the
order is by key. The segment id either packs into the same u32 word above
the masked key bits (ceil(log2(S)) + bit_count <= 32: one key column, the
cost of a flat masked sort) or rides as a dedicated column in the engine's
lexicographic tuple (`ops/bitonic.py _lex_lt`, ~3 vector ops per stage).

`offsets` is a traced operand (one compiled pipeline serves every
segmentation of the same shape); segment ids (and starts, for ranks) come
from tiny boundary scatters + the streaming Pallas add-scan — NOT from
`searchsorted`, whose gather lowering is element-serial on TPU (measured
1.62 s of a 1.65 s segmented sort at 16M; `benchmarks/explore_segmented.py`
and DESIGN.md "Segmented engine").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import common
from .sort64 import _pad_sort_cols


def sort_segments(
    keys,
    offsets,
    values=None,
    *,
    bit_count: int | None = None,
    descending: bool = False,
    total_order: bool = False,
    values_are_ranks: bool = False,
    method: str = "auto",
    block_rows=None,
    interpret=None,
    mesh=None,
    axis_name: str = "x",
):
    """Stable ascending sort of each segment `[offsets[i], offsets[i+1])`
    of a flat 1-D key array, co-permuting optional 32-bit `values`.

    `offsets`: 1-D integer array, length S+1, with offsets[0] == 0,
    offsets[-1] == len(keys), nondecreasing (CSR segment boundaries; this
    contract is the caller's — offsets are traced, not validated).
    Same key-dtype/option surface as :func:`sort` (64-bit dtypes under
    jax x64). `values_are_ranks=True` promises each SEGMENT of `values`,
    viewed as u32, is strictly increasing with every element < 0xFFFFFFFF.
    Returns keys or (keys, values), same shape.

    ``mesh=`` routes the same call across a mesh axis: segment ids come
    from the distributed prefix sum and the composite (seg, key, idx)
    tuple rides the compare-split network (`parallel/segmented.py`).
    `values_are_ranks` is a single-chip comparison-engine contract and is
    ignored distributed (the shard-local index tie-break is built in).
    """
    common.guard_64bit_downcast(keys)
    keys = jnp.asarray(keys)
    if keys.ndim != 1:
        raise ValueError("sort_segments expects a 1-D key array")
    offsets = jnp.asarray(offsets)
    if offsets.ndim != 1 or offsets.shape[0] < 2:
        raise ValueError("offsets must be 1-D with length >= 2 (S+1 bounds)")
    if not jnp.issubdtype(offsets.dtype, jnp.integer):
        raise TypeError("offsets must be an integer array")
    wide = common.is_64bit_key_dtype(keys.dtype)
    if wide:
        bit_count = 64 if bit_count is None else bit_count
        common.validate_bit_count_64(bit_count)
    elif (keys.dtype in (jnp.uint32, jnp.float32, jnp.int32)
          or common.is_16bit_key_dtype(keys.dtype)):
        if bit_count is None:
            bit_count = common.native_key_bits(keys.dtype)
        common.validate_bit_count_for(keys.dtype, bit_count)
    else:
        raise TypeError(f"unsupported key dtype {keys.dtype}")
    if values is not None:
        common.guard_64bit_value_downcast(values)
        values = jnp.asarray(values)
        if values.shape != keys.shape:
            raise ValueError("values must match keys shape")
        common.validate_value_dtype(values)
        if values_are_ranks and values.dtype.itemsize != 4:
            raise ValueError(
                "values_are_ranks requires a 32-bit value dtype (the rank "
                "contract is a single u32 column)"
            )
    if mesh is not None:
        if method not in ("auto", "mesh"):
            raise ValueError(
                "with mesh=, sort_segments supports method in "
                f"('auto', 'mesh'); got {method!r}"
            )
        from ..parallel.segmented import mesh_sort_segments

        return mesh_sort_segments(
            keys, offsets, values,
            mesh=mesh, axis_name=axis_name, bit_count=bit_count,
            descending=descending, total_order=total_order,
            make_ranks=False, block_rows=block_rows, interpret=interpret,
        )
    if method not in ("auto", "bitonic", "xla"):
        raise ValueError(
            "sort_segments supports method in ('auto', 'bitonic', 'xla'); "
            f"got {method!r}"
        )
    if interpret is None:
        interpret = common.default_interpret()
    return _sort_segments_jit(
        keys,
        offsets,
        values,
        bit_count=bit_count,
        descending=descending,
        total_order=total_order,
        values_are_ranks=values_are_ranks and values is not None,
        make_ranks=False,
        method="bitonic" if method == "auto" else method,
        block_rows=block_rows,
        interpret=interpret,
    )


def argsort_segments(keys, offsets, *, bit_count=None, descending=False,
                     total_order=False, method="auto", block_rows=None,
                     interpret=None, mesh=None, axis_name="x"):
    """Per-segment stable ranks (positions within the segment each element
    sorts to). The position-minus-segment-start payload satisfies the
    segmented rank contract; it is built INSIDE the jitted core from the
    same boundary-scan that produces the segment ids (no offsets[seg]
    gather — see `_segment_ids_and_starts`). ``mesh=`` routes distributed
    (see :func:`sort_segments`)."""
    common.guard_64bit_downcast(keys)
    keys = jnp.asarray(keys)
    if keys.ndim != 1:
        raise ValueError("argsort_segments expects a 1-D key array")
    offsets = jnp.asarray(offsets)
    wide = common.is_64bit_key_dtype(keys.dtype)
    if bit_count is None:
        bit_count = 64 if wide else 32
    if mesh is not None:
        if method not in ("auto", "mesh"):
            raise ValueError(
                "with mesh=, argsort_segments supports method in "
                f"('auto', 'mesh'); got {method!r}"
            )
        from ..parallel.segmented import mesh_sort_segments

        return mesh_sort_segments(
            keys, offsets, None,
            mesh=mesh, axis_name=axis_name, bit_count=bit_count,
            descending=descending, total_order=total_order,
            make_ranks=True, block_rows=block_rows, interpret=interpret,
        )[1]
    if interpret is None:
        interpret = common.default_interpret()
    return _sort_segments_jit(
        keys,
        offsets,
        None,
        bit_count=bit_count,
        descending=descending,
        total_order=total_order,
        values_are_ranks=True,
        make_ranks=True,
        method="bitonic" if method == "auto" else method,
        block_rows=block_rows,
        interpret=interpret,
    )[1]


def _segment_ids_and_starts(offsets, n, *, interpret, need_starts):
    """Element position -> (segment id, segment start) WITHOUT searchsorted.

    `searchsorted(offsets, arange(n))` lowers to data-dependent gathers,
    which are element-serial on TPU — measured 2026-08-19 at 16M/1024
    segments it made the whole segmented sort 1.62 s when the sort network
    itself costs ~30 ms (`benchmarks/explore_segmented.py`). Instead:
    scatter tiny per-boundary records (S-1 elements) and run the streaming
    Pallas add-scan (`ops/scan.py`, 0.9 ms at 16M):

    - seg id:  +1 at each interior boundary, inclusive-scanned — the count
      of boundaries <= j IS the segment id (coincident boundaries from
      empty segments accumulate, advancing the id by their multiplicity).
    - seg start: +(offsets[i] - offsets[i-1]) at boundary i telescopes
      under the scan to the largest boundary <= j, i.e. the segment start
      (`ranks = pos - start` for argsort_segments).
    """
    from . import scan as scan_mod

    b = offsets[1:-1].astype(jnp.int32)  # interior boundaries (S-1)
    ind = jnp.zeros((n,), jnp.uint32).at[b].add(
        jnp.uint32(1), mode="drop")
    seg = scan_mod.prefix_sum(ind, inclusive=True, interpret=interpret)
    if not need_starts:
        return seg, None
    delta = (offsets[1:-1] - offsets[:-2]).astype(jnp.uint32)
    d = jnp.zeros((n,), jnp.uint32).at[b].add(delta, mode="drop")
    starts = scan_mod.prefix_sum(d, inclusive=True, interpret=interpret)
    return seg, starts


@functools.partial(
    jax.jit,
    static_argnames=(
        "bit_count",
        "descending",
        "total_order",
        "values_are_ranks",
        "make_ranks",
        "method",
        "block_rows",
        "interpret",
    ),
)
def _sort_segments_jit(
    keys,
    offsets,
    values,
    *,
    bit_count,
    descending,
    total_order,
    values_are_ranks,
    make_ranks,
    method,
    block_rows,
    interpret,
):
    n = keys.shape[0]
    S = offsets.shape[0] - 1
    have_values = values is not None or make_ranks
    if n <= 1:
        if make_ranks:
            return keys, jnp.zeros((n,), jnp.uint32)
        return keys if values is None else (keys, values)

    if wide := common.is_64bit_key_dtype(keys.dtype):
        if total_order:
            full_cols = common.to_total_order_u64_cols(keys)
        else:
            full_cols = common.to_sortable_u64_cols(keys)
        masks = common.bit_mask_cols(bit_count)
        masked = bit_count < 64
        lo_only = bit_count <= 32
        mcols = tuple(c & m for c, m in zip(full_cols, masks))
        if descending:
            mcols = tuple(c ^ m for c, m in zip(mcols, masks))
        mk_cols = (mcols[1],) if lo_only else mcols
        key_width = 32  # segment bits never pack into a 64-bit pair
    else:
        if total_order:
            full_cols = (common.to_total_order_u32(keys),)
        else:
            full_cols = (common.to_sortable_u32(keys),)
        masks = (common.bit_mask(bit_count),)
        masked = bit_count < common.native_key_bits(keys.dtype)
        mk = full_cols[0] & masks[0]
        if descending:
            mk = mk ^ masks[0]
        mk_cols = (mk,)
        # seg ids pack above the real key bits; 16-bit keys leave 16+ spare
        key_width = bit_count

    seg, seg_starts = _segment_ids_and_starts(
        offsets, n, interpret=interpret, need_starts=make_ranks)
    seg_bits = max(1, (S - 1).bit_length())
    packed = not wide and seg_bits + key_width <= 32
    if packed:
        # composite single column: segment id above the masked key bits
        key_cols = ((seg << key_width) | mk_cols[0],)
    else:
        key_cols = (seg, *mk_cols)

    # per-segment ranks from the scanned segment starts (an offsets[seg]
    # GATHER at n indices would be element-serial, like the searchsorted
    # this path replaced)
    ranks = None
    if make_ranks:
        ranks = jnp.arange(n, dtype=jnp.uint32) - seg_starts

    carry_full = masked or descending
    stable = carry_full or have_values

    if make_ranks:
        vcols = (ranks,)
    elif values is not None:
        # 8-byte value dtypes ride as an (hi, lo) u32 column pair
        vcols = common.values_to_u32_cols(values)
    else:
        vcols = ()

    if method == "xla":
        payloads = list(full_cols) if carry_full else []
        payloads.extend(vcols)
        out = jax.lax.sort(
            (*key_cols, *payloads), num_keys=len(key_cols), is_stable=stable,
        )
        base = len(key_cols)
        if carry_full:
            sorted_cols = out[base: base + len(full_cols)]
        elif packed:
            # unmasked ascending 16-bit keys pack under the seg id in ONE
            # column with nothing carried: unmask the key bits back out
            sorted_cols = (out[0] & common.bit_mask(key_width),)
        else:
            # unmasked ascending (masked/descending always carry), so the
            # segment id is a separate leading column here
            sorted_cols = out[1: 1 + len(full_cols)]
        v_sorted = out[len(out) - len(vcols):] if have_values else None
    else:
        payloads = []
        rank_tie = values_are_ranks and have_values
        if carry_full:
            payloads += list(full_cols)
        if have_values and not rank_tie:
            payloads.extend(vcols)
        # rank ties are 4-byte only (validated upstream), so vcols[0] is
        # the whole payload when it serves as the tie column
        tie = vcols[0] if rank_tie else ("iota" if stable else None)
        out = _pad_sort_cols(
            key_cols, tie, payloads,
            block_rows=block_rows, interpret=interpret,
        )
        nk = len(key_cols)
        base = nk + (1 if stable else 0)
        if carry_full:
            sorted_cols = out[base: base + len(full_cols)]
        elif packed:
            # unmasked ascending 16-bit keys pack under the seg id in ONE
            # column with nothing carried: unmask the key bits back out
            sorted_cols = (out[0] & common.bit_mask(key_width),)
        else:
            # unmasked ascending (masked/descending always carry), so the
            # segment id is a separate leading column here
            sorted_cols = out[1: 1 + len(full_cols)]
        if not have_values:
            v_sorted = None
        elif rank_tie:
            v_sorted = (out[nk],)
        else:
            v_sorted = out[len(out) - len(vcols):]

    if wide:
        s_hi, s_lo = sorted_cols
        if total_order:
            out_keys = common.from_total_order_u64_cols(s_hi, s_lo, keys.dtype)
        else:
            out_keys = common.from_sortable_u64_cols(s_hi, s_lo, keys.dtype)
    else:
        u = sorted_cols[0]
        if total_order:
            out_keys = common.from_total_order_u32(u, keys.dtype)
        else:
            out_keys = common.from_sortable_u32(u, keys.dtype)
    if not have_values:
        return out_keys
    if make_ranks:
        return out_keys, v_sorted[0]  # already uint32 ranks
    return out_keys, common.values_from_u32_cols(v_sorted, values.dtype)
