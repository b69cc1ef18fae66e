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


def _shard_disorder(u, *, axis_name, n_dev, count, interpret):
    """Per-shard body for the public distributed disorder count: elements at
    global index >= `count` become SENTINELs (all-equal max keys create no
    inversions, the exact trick the single-chip padding uses), then local
    streaming reduction + the cross-shard boundary pair, psum'd."""
    L = u.shape[0]
    me = jax.lax.axis_index(axis_name)
    gidx = me.astype(jnp.uint32) * jnp.uint32(L) + jnp.arange(
        L, dtype=jnp.uint32
    )
    u = jnp.where(gidx < jnp.uint32(count), u, jnp.uint32(0xFFFFFFFF))
    bad = checksort.disorder_count(u, interpret=interpret)
    if n_dev > 1:
        recv = jax.lax.ppermute(
            u[:1], axis_name, [(i, i - 1) for i in range(1, n_dev)]
        )
        bad = bad + jnp.where(
            me < n_dev - 1,
            (u[-1] > recv[0]).astype(jnp.uint32),
            jnp.uint32(0),
        )
    return jax.lax.psum(bad, axis_name)


def _prep_check_input(u, *, count, bit_count, mesh, axis_name):
    """Shared validation + key-view + SENTINEL pad for the public mesh
    checks. Returns (u32 array of length round_up(n, D), count)."""
    from ..ops import common

    bit_count = 32 if bit_count is None else bit_count  # 64-bit: single-chip
    common.validate_bit_count(bit_count)
    u = checksort._as_check_key(u, bit_count)
    n = u.shape[0]
    count = n if count is None else int(count)
    if not (0 <= count <= n):
        raise ValueError(f"count {count} out of range for buffer of {n}")
    n_dev = mesh.shape[axis_name]
    n_pad = common.round_up(max(n, n_dev), n_dev)
    return common.pad_to(u, n_pad, common.SENTINEL_U32), count


def mesh_disorder_count(u, *, mesh, axis_name="x", count=None,
                        bit_count: int = 32, interpret=None):
    """Distributed adjacent-inversion count of the first `count` keys.

    Public mesh lift of :func:`tpu_radix_sort.disorder_count` (the
    reference's CheckSort reduction, `src/shaders/CheckSort.ts:70-113`):
    per-shard streaming Pallas reductions + one edge-element `ppermute` +
    one `psum`. Same `count`/`bit_count`/dtype semantics as single-chip.
    """
    from ..ops import common

    u, count = _prep_check_input(
        u, count=count, bit_count=bit_count, mesh=mesh, axis_name=axis_name
    )
    if count < 2:
        return jnp.uint32(0)
    if interpret is None:
        interpret = common.default_interpret_for_mesh(mesh)
    n_dev = mesh.shape[axis_name]
    fn = jax.shard_map(
        functools.partial(
            _shard_disorder,
            axis_name=axis_name,
            n_dev=n_dev,
            count=count,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(),
        check_vma=False,
    )
    return fn(u)


def mesh_is_sorted(u, *, mesh, axis_name="x", count=None,
                   bit_count: int = 32, interpret=None):
    """Distributed fast-gated order check of the first `count` keys.

    Public mesh lift of :func:`tpu_radix_sort.is_sorted`: each shard runs
    the fast(1024)-gated local check, boundary pairs ride one `ppermute`,
    verdicts combine in one `psum` (same machinery that gates the
    distributed sorts' `check_order=True`).
    """
    from ..ops import common

    u, count = _prep_check_input(
        u, count=count, bit_count=bit_count, mesh=mesh, axis_name=axis_name
    )
    if count < 2:
        return jnp.bool_(True)
    if interpret is None:
        interpret = common.default_interpret_for_mesh(mesh)
    n_dev = mesh.shape[axis_name]
    # elements past count become SENTINELs (elementwise, so XLA applies it
    # shard-local) — the padded-sorted-tail invariant global_is_sorted's
    # sort callers already maintain
    in_count = jnp.arange(u.shape[0], dtype=jnp.uint32) < jnp.uint32(count)
    u = jnp.where(in_count, u, jnp.uint32(0xFFFFFFFF))
    return global_is_sorted(
        u, mesh=mesh, axis_name=axis_name, n_dev=n_dev, interpret=interpret
    )
