"""Distributed segmented sorts vs the single-chip engine and the oracle,
on a virtual 8-device mesh.

The reference is single-GPU with no segmented op (`src/kernels/...`); this
covers the mesh lift (`parallel/segmented.py`): distributed-scan segment
ids + the composite (seg, key, idx) tuple over the compare-split network.
Oracle: numpy lexsort by (segment, key, position) — same style as
`example/tests.ts` golden checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_radix_sort as trs
from tpu_radix_sort.parallel import sharded
from jax.sharding import Mesh


def make_mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("x",))


def ragged_offsets(rng, n, S, empties=0):
    cuts = np.sort(rng.choice(np.arange(1, n), S - 1, replace=False))
    offs = np.concatenate([[0], cuts, [n]]).astype(np.int32)
    if empties:
        dup = rng.choice(offs, empties)
        offs = np.sort(np.concatenate([offs, dup])).astype(np.int32)
    return offs


def seg_of(offs, n):
    return np.repeat(np.arange(len(offs) - 1), np.diff(offs))


@pytest.mark.parametrize("n_dev,n,S", [(2, 1000, 7), (8, 4096, 23), (8, 3000, 50)])
def test_mesh_segments_matches_oracle_and_single_chip(rng, n_dev, n, S):
    mesh = make_mesh(n_dev)
    offs = ragged_offsets(rng, n, S, empties=2)
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    seg = seg_of(offs, n)
    perm = np.lexsort((np.arange(n), k, seg))
    got_k, got_v = trs.sort_segments(
        sharded(mesh, "x", jnp.asarray(k)), jnp.asarray(offs),
        values=sharded(mesh, "x", jnp.asarray(v)), mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(got_k), k[perm])
    np.testing.assert_array_equal(np.asarray(got_v), v[perm])  # stability
    # byte-exact vs the single-chip engine
    ref_k, ref_v = trs.sort_segments(
        jnp.asarray(k), jnp.asarray(offs), values=jnp.asarray(v)
    )
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_mesh_argsort_segments_ranks(rng):
    mesh = make_mesh(8)
    n, S = 3000, 17
    offs = ragged_offsets(rng, n, S, empties=1)
    k = rng.integers(0, 100, n, dtype=np.uint64).astype(np.uint32)  # dup-heavy
    seg = seg_of(offs, n)
    perm = np.lexsort((np.arange(n), k, seg))
    idx = trs.argsort_segments(
        sharded(mesh, "x", jnp.asarray(k)), jnp.asarray(offs), mesh=mesh
    )
    starts = offs[seg]
    np.testing.assert_array_equal(k[starts + np.asarray(idx)], k[perm])
    # stable ranks == single-chip ranks, byte-exact
    ref = trs.argsort_segments(jnp.asarray(k), jnp.asarray(offs))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_mesh_segments_descending_and_masked_packed(rng):
    """bit_count=16 with small S packs (seg << 16 | key) into ONE column —
    the packed fast path crosses the mesh too; descending flips only the
    key bits under the segment id."""
    mesh = make_mesh(8)
    n, S = 2048, 5
    offs = ragged_offsets(rng, n, S)
    k = rng.integers(0, 2**16, n, dtype=np.uint64).astype(np.uint32)
    seg = seg_of(offs, n)
    up = trs.sort_segments(
        sharded(mesh, "x", jnp.asarray(k)), jnp.asarray(offs),
        mesh=mesh, bit_count=16,
    )
    np.testing.assert_array_equal(
        np.asarray(up), k[np.lexsort((np.arange(n), k, seg))])
    down = trs.sort_segments(
        sharded(mesh, "x", jnp.asarray(k)), jnp.asarray(offs),
        mesh=mesh, bit_count=16, descending=True,
    )
    np.testing.assert_array_equal(
        np.asarray(down), k[np.lexsort((np.arange(n), ~k, seg))])


def test_mesh_segments_float_total_order(rng):
    mesh = make_mesh(4)
    n, S = 1500, 9
    offs = ragged_offsets(rng, n, S)
    f = rng.standard_normal(n).astype(np.float32)
    f[::97] = -0.0
    f[::101] = np.nan
    got = np.asarray(trs.sort_segments(
        sharded(mesh, "x", jnp.asarray(f)), jnp.asarray(offs),
        mesh=mesh, total_order=True,
    ))
    ref = np.asarray(trs.sort_segments(
        jnp.asarray(f), jnp.asarray(offs), total_order=True))
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.fixture
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_mesh_segments_u64(rng, _x64):
    """64-bit keys ride as a (seg, hi, lo, idx) column tuple — the one case
    with three compare columns ahead of the tie index."""
    mesh = make_mesh(8)
    n, S = 2048, 11
    offs = ragged_offsets(rng, n, S, empties=1)
    k = rng.integers(0, 2**64, n, dtype=np.uint64)
    k[: n // 3] = (k[: n // 3] & np.uint64(0xFF)) | (np.uint64(3) << np.uint64(32))
    v = np.arange(n, dtype=np.uint32)
    seg = seg_of(offs, n)
    perm = np.lexsort((np.arange(n), k, seg))
    got_k, got_v = trs.sort_segments(
        sharded(mesh, "x", jnp.asarray(k)), jnp.asarray(offs),
        values=sharded(mesh, "x", jnp.asarray(v)), mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(got_k), k[perm])
    np.testing.assert_array_equal(np.asarray(got_v), v[perm])


def test_mesh_segments_method_validation(rng):
    mesh = make_mesh(2)
    k = jnp.zeros(256, jnp.uint32)
    offs = jnp.asarray([0, 128, 256], jnp.int32)
    with pytest.raises(ValueError, match="mesh"):
        trs.sort_segments(k, offs, mesh=mesh, method="xla")
