"""Distributed order-check gate for the mesh-level sorts.

Lifts the reference's CheckSort early-exit semantics
(`src/shaders/CheckSort.ts:139-145`: "is_sorted == 1 => zero every dispatch
record") to a device mesh: each shard runs the same fast-gated local check
the single-chip path uses (`ops/checksort.is_sorted` — fast 1024-element
prefix gating the full streaming Pallas reduction), shard boundaries are
covered by ONE `ppermute` of each shard's first element, and the verdicts
combine with ONE `psum`. The callers wrap their sort `shard_map` in a
`lax.cond` on the replicated verdict — a nearly-sorted global array then
skips the whole exchange network.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import checksort


def _shard_verdict(mk, *, axis_name, n_dev, interpret):
    """Per-shard body: local fast-gated check + boundary pair, psum'd.

    `mk` is this shard's slice of the padded masked-key array in its
    original (pre-sort) order; sentinel pads live at the global tail, so
    the global array is sorted iff the real prefix is.
    """
    ok_local = checksort.is_sorted(mk, interpret=interpret)
    bad = (~ok_local).astype(jnp.uint32)
    if n_dev > 1:
        # boundary pairs: shard d's last element vs shard d+1's first.
        # Each shard sends its first element one shard to the LEFT; the
        # last shard's slot stays zero-filled and is masked out.
        recv = jax.lax.ppermute(
            mk[:1], axis_name, [(i, i - 1) for i in range(1, n_dev)]
        )
        me = jax.lax.axis_index(axis_name)
        boundary_bad = jnp.where(
            me < n_dev - 1,
            (mk[-1] > recv[0]).astype(jnp.uint32),
            jnp.uint32(0),
        )
        bad = bad + boundary_bad
    return jax.lax.psum(bad, axis_name) == 0


def global_is_sorted(mk, *, mesh, axis_name, n_dev, interpret):
    """Replicated bool: is the sharded masked-key array globally sorted?

    One collective round (psum; plus one edge-element ppermute for D > 1).
    """
    fn = jax.shard_map(
        functools.partial(
            _shard_verdict,
            axis_name=axis_name,
            n_dev=n_dev,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(),  # psum result is replicated
        check_vma=False,
    )
    return fn(mk)
