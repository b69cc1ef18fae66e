"""Batched (per-row) sorts: independently sort each row of a 2-D array.

Extension past the reference (one flat buffer per sort,
``src/kernels/radix-sort/AbstractRadixSortKernel.ts``). On TPU the natural
formulation is a *composite key*: sorting the flattened array by
(row_id, key) lexicographically IS sorting each row independently — rows
never interleave because row_id dominates, and within a row the order is
by key. That rides the engine's lexicographic column tuples
(`ops/bitonic.py _lex_lt`) with zero new device code:

- 32-bit keys with ``bit_count + ceil(log2(B))`` <= 32: the row id packs
  into the SAME u32 word above the masked key bits — one key column, the
  exact cost of a flat masked sort.
- otherwise: a dedicated row-id column ((row, key) or (row, hi, lo) for
  64-bit keys) — ~3 extra vector ops per stage.

One blocked network over B*n elements costs O(log^2(B*n)) stages vs the
per-row ideal O(log^2 n), but runs at the engine's blocked-HBM pass count —
compare `method='xla'` (`jax.lax.sort` batched natively) on chip.

Stability per row, `descending` (key bits flip, row bits don't),
`total_order`, masked `bit_count`, and value payloads all carry over.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import common
from .sort64 import _pad_sort_cols


def sort_batched(
    keys,
    values=None,
    *,
    bit_count: int | None = None,
    descending: bool = False,
    total_order: bool = False,
    values_are_ranks: bool = False,
    method: str = "auto",
    block_rows=None,
    interpret=None,
):
    """Sort each row of a (B, n) key array independently (stable, ascending
    by default), co-permuting an optional same-shape 32-bit `values` array.

    Same key-dtype surface as :func:`sort` (uint32/float32/int32 and the
    64-bit dtypes under jax x64); `bit_count` masks per key word like the
    flat sort. `values_are_ranks=True` promises each ROW of `values`,
    viewed as u32, is strictly increasing with every element < 0xFFFFFFFF
    (e.g. a per-row iota — the argsort payload): the payload then doubles
    as the stability tie-break. Returns keys or (keys, values), same shape.
    """
    keys = jnp.asarray(keys)
    if keys.ndim != 2:
        raise ValueError("sort_batched expects a 2-D (batch, n) key array")
    wide = common.is_64bit_key_dtype(keys.dtype)
    if wide:
        bit_count = 64 if bit_count is None else bit_count
        common.validate_bit_count_64(bit_count)
    elif keys.dtype in (jnp.uint32, jnp.float32, jnp.int32):
        bit_count = 32 if bit_count is None else bit_count
        common.validate_bit_count(bit_count)
    else:
        raise TypeError(f"unsupported key dtype {keys.dtype}")
    if values is not None:
        values = jnp.asarray(values)
        if values.shape != keys.shape:
            raise ValueError("values must match keys shape")
        if values.dtype.itemsize != 4:
            raise TypeError("values must be a 32-bit dtype")
    if method not in ("auto", "bitonic", "xla"):
        raise ValueError(
            "sort_batched supports method in ('auto', 'bitonic', 'xla'); "
            f"got {method!r}"
        )
    if interpret is None:
        interpret = common.default_interpret()
    return _sort_batched_jit(
        keys,
        values,
        bit_count=bit_count,
        descending=descending,
        total_order=total_order,
        values_are_ranks=values_are_ranks and values is not None,
        method="bitonic" if method == "auto" else method,
        block_rows=block_rows,
        interpret=interpret,
    )


def argsort_batched(keys, **kwargs):
    """Per-row stable ranks: positions each row's elements sort to.

    The per-row iota payload satisfies the batched rank contract (row id
    dominates the compare tuple, so ties only resolve within a row), so
    this always takes the rank-payload path — no separate index column.
    """
    keys = jnp.asarray(keys)
    if keys.ndim != 2:
        raise ValueError("argsort_batched expects a 2-D (batch, n) key array")
    ranks = jnp.broadcast_to(
        jnp.arange(keys.shape[1], dtype=jnp.uint32), keys.shape
    )
    kwargs.setdefault("values_are_ranks", True)
    return sort_batched(keys, ranks, **kwargs)[1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "bit_count",
        "descending",
        "total_order",
        "values_are_ranks",
        "method",
        "block_rows",
        "interpret",
    ),
)
def _sort_batched_jit(
    keys,
    values,
    *,
    bit_count,
    descending,
    total_order,
    values_are_ranks,
    method,
    block_rows,
    interpret,
):
    B, n = keys.shape
    wide = common.is_64bit_key_dtype(keys.dtype)
    if B * n == 0 or n <= 1:
        return keys if values is None else (keys, values)

    flat = keys.reshape(B * n)
    if wide:
        if total_order:
            full_cols = common.to_total_order_u64_cols(flat)
        else:
            full_cols = common.to_sortable_u64_cols(flat)
        masks = common.bit_mask_cols(bit_count)
        masked = bit_count < 64
        lo_only = bit_count <= 32
        mcols = tuple(c & m for c, m in zip(full_cols, masks))
        if descending:
            mcols = tuple(c ^ m for c, m in zip(mcols, masks))
        mk_cols = (mcols[1],) if lo_only else mcols
        key_width = 32  # row bits never pack into a 64-bit pair
    else:
        if total_order:
            full_cols = (common.to_total_order_u32(flat),)
        else:
            full_cols = (common.to_sortable_u32(flat),)
        masks = (common.bit_mask(bit_count),)
        masked = bit_count < 32
        mk = full_cols[0] & masks[0]
        if descending:
            mk = mk ^ masks[0]
        mk_cols = (mk,)
        key_width = bit_count

    row = jnp.repeat(
        jnp.arange(B, dtype=jnp.uint32), n, total_repeat_length=B * n
    )
    row_bits = max(1, (B - 1).bit_length())
    if not wide and row_bits + key_width <= 32:
        # composite single column: row id above the masked key bits —
        # the batch dimension rides for free in the flat sort's word
        key_cols = ((row << key_width) | mk_cols[0],)
    else:
        key_cols = (row, *mk_cols)

    carry_full = masked or descending
    stable = carry_full or values is not None

    if method == "xla":
        # lax.sort is natively batched (sorts along the last axis per
        # row), so the row-id column is unnecessary on this path
        ks = tuple(c.reshape(B, n) for c in mk_cols)
        payloads = []
        if carry_full:
            payloads += [c.reshape(B, n) for c in full_cols]
        if values is not None:
            payloads.append(
                jax.lax.bitcast_convert_type(values, jnp.uint32)
            )
        out = jax.lax.sort(
            (*ks, *payloads), num_keys=len(ks), is_stable=stable,
            dimension=1,
        )
        sorted_cols = (
            out[len(ks): len(ks) + len(full_cols)] if carry_full
            else out[: len(full_cols)]
        )
        sorted_cols = tuple(c.reshape(B * n) for c in sorted_cols)
        v_sorted = (
            out[-1].reshape(B * n) if values is not None else None
        )
    else:
        payloads = []
        rank_tie = None
        if carry_full:
            payloads += list(full_cols)
        if values is not None:
            v_u32 = jax.lax.bitcast_convert_type(
                values.reshape(B * n), jnp.uint32
            )
            if values_are_ranks:
                # per-row increasing ranks are a valid tie column: the row
                # id dominates, so ties only compare within a row
                rank_tie = v_u32
            else:
                payloads.append(v_u32)
        if stable and rank_tie is not None:
            out = _pad_sort_cols(
                key_cols, rank_tie, payloads,
                block_rows=block_rows, interpret=interpret,
            )
            nk = len(key_cols)
            v_sorted, tail = out[nk], list(out[nk + 1:])
        elif stable:
            out = _pad_sort_cols(
                key_cols, "iota", payloads,
                block_rows=block_rows, interpret=interpret,
            )
            nk = len(key_cols) + 1
            tail = list(out[nk:])
            v_sorted = tail.pop() if values is not None else None
        else:
            out = _pad_sort_cols(
                key_cols, None, payloads,
                block_rows=block_rows, interpret=interpret,
            )
            tail, v_sorted = list(out[len(key_cols):]), None
        if carry_full:
            sorted_cols = tuple(tail[: len(full_cols)])
        elif wide:
            # key_cols = (row, hi, lo): skip the leading row column
            sorted_cols = out[1: 1 + len(full_cols)]
        else:
            # 32-bit unmasked ascending: the sorted key is the last key
            # column (a composite row<<bits packing implies masked, and
            # masked/descending always carry the full key)
            sorted_cols = (out[len(key_cols) - 1],)

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
    out_keys = out_keys.reshape(B, n)
    if values is None:
        return out_keys
    out_values = jax.lax.bitcast_convert_type(
        v_sorted, values.dtype
    ).reshape(B, n)
    return out_keys, out_values
