"""Tiling / launch-geometry heuristics.

Reference counterpart: `findOptimalDispatchSize` factors a 1-D workgroup
count into a 2-D grid under the 65,535-per-dimension WebGPU limit
(`src/utils.ts:8-23`), and `AbstractKernel` derives threads/items per
workgroup from the workgroup shape (`src/kernels/AbstractKernel.ts:41-51`).
The TPU analogues are VMEM-budgeted tile shapes: the constraint is on-chip
memory, not grid-dimension caps.
"""
from __future__ import annotations

from ..ops import common

LANES = 128
# Conservative per-kernel VMEM budget (v5e/v5p have ~64-128 MB VMEM but
# Mosaic needs headroom for temporaries and double buffering).
VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def choose_block_rows(n_pad: int, n_arrays: int, budget=VMEM_BUDGET_BYTES) -> int:
    """Pick the sort-engine tile height (rows of 128 lanes, power of two).

    Sizing: in + out + temporaries for each of the co-sorted u32 arrays must
    fit the VMEM budget. Bigger tiles mean fewer merge rounds touch HBM.
    """
    rows_total = max(1, n_pad // LANES)
    # ~3x factor: input block, output block, live temporaries
    per_row_bytes = n_arrays * LANES * 4 * 3
    rows = max(8, budget // per_row_bytes)
    return min(common.next_pow2(rows_total), common.next_pow2(rows + 1) // 2)
