"""Order-check reduction and early-exit gating.

Reference counterpart: the CheckSort kernel family — a tree reduction of the
adjacent-pair disorder indicator `keys[i] > keys[i+1]`
(`src/shaders/CheckSort.ts:102-113`), split into a cheap "fast" check over
the first `4 * threads` elements that gates the "full" check over the rest,
with results steering GPU-side indirect-dispatch records
(`src/shaders/CheckSort.ts:115-145`, `AbstractRadixSortKernel.ts:249-276`).

On TPU the control flow inverts cleanly: the disorder reduction is a fused
compare+reduce (one HBM-bound pass — XLA emits the tree reduction the WGSL
writes by hand), and "zeroing the dispatch record" becomes `lax.cond` over
the whole sort computation. The fast/full split is kept: the fast slice's
verdict gates whether the full reduction runs at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's fast-check window: the first min(count, 4*threads)
# elements with the default 256-thread workgroup (AbstractRadixSortKernel.ts:139).
FAST_CHECK_ELEMENTS = 1024


def disorder_count(u: jax.Array) -> jax.Array:
    """Number of adjacent inversions in a 1-D u32 array (0 == sorted)."""
    if u.shape[0] < 2:
        return jnp.uint32(0)
    return jnp.sum((u[:-1] > u[1:]).astype(jnp.uint32))


def is_sorted(u: jax.Array) -> jax.Array:
    """Fast-gated full order check, mirroring the reference's two-phase check.

    The fast phase samples the first FAST_CHECK_ELEMENTS keys; only if that
    prefix is ordered does the full reduction over the remainder run
    (reference overlaps the boundary pair by starting the full check at
    fast_count - 1, AbstractRadixSortKernel.ts:139-141).
    """
    n = u.shape[0]
    f = min(n, FAST_CHECK_ELEMENTS)
    fast_ok = disorder_count(u[:f]) == 0
    if f >= n:
        return fast_ok
    # include the boundary pair by starting at f - 1
    return jax.lax.cond(
        fast_ok,
        lambda: disorder_count(jax.lax.slice(u, (f - 1,), (n,))) == 0,
        lambda: jnp.bool_(False),
    )


def with_early_exit(u_sorted_check: jax.Array, passthrough, compute_fn):
    """Return passthrough unchanged if already sorted, else compute_fn().

    `passthrough` and `compute_fn()` must be pytrees of identical structure.
    This is the `lax.cond` analogue of the reference zeroing every dispatch
    record when `is_sorted == 1` (src/shaders/CheckSort.ts:139-145).
    """
    ok = is_sorted(u_sorted_check)
    return jax.lax.cond(ok, lambda: passthrough, compute_fn)
