"""Scan-kernel variant exploration on chip (public-op optimization).

The streaming scan measures 0.90 ms at 16M (148 GB/s effective) vs the
855 GB/s HBM roofline — ~6x off. Variants isolate where the time goes:

  copy      pure in->out DMA through the same grid/tile shape (floor)
  nomask    current algorithm with AND-masks instead of where-selects
  current   ops/scan.py as shipped
  twopass   parallel block-sum pass + add-back pass (no serial carry)

Run alone: python benchmarks/explore_scan.py
"""
import functools
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_radix_sort.ops import scan as scan_ops
from tpu_radix_sort.runtime.timing import device_time

LANES = 128


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _masked_shift_and(x, s, axis, masks):
    rolled = pltpu.roll(x, s, axis=axis)
    return rolled & masks[(s, axis)]


def _cumsum_2d_and(x, masks):
    rows = x.shape[0]
    s = 1
    while s < LANES:
        x = x + _masked_shift_and(x, s, 1, masks)
        s *= 2
    own_tot = x[:, LANES - 1:]
    row_tot = own_tot
    s = 1
    while s < rows:
        rolled = pltpu.roll(row_tot, s, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, row_tot.shape, 0)
        row_tot = row_tot + jnp.where(idx >= s, rolled, jnp.uint32(0))
        s *= 2
    return x + (row_tot - own_tot)


def _scan_kernel_and(x_ref, o_ref, carry):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[0] = jnp.uint32(0)

    x = x_ref[:]
    # AND-masks (u32 0/~0) for the lane shifts, built once per call
    masks = {}
    s = 1
    while s < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        masks[(s, 1)] = jnp.where(lane >= s, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        s *= 2
    inc = _cumsum_2d_and(x, masks)
    c = carry[0]
    o_ref[:] = inc - x + c
    carry[0] = c + inc[x.shape[0] - 1, LANES - 1]


def _blocksum_kernel(x_ref, o_ref, *, rows):
    b = pl.program_id(0)
    o_ref[b] = jnp.sum(x_ref[:].astype(jnp.int32)).astype(jnp.uint32)


def _addback_kernel(off_ref, x_ref, o_ref):
    b = pl.program_id(0)
    x = x_ref[:]
    inc = scan_ops._cumsum_2d(x)
    o_ref[:] = inc - x + off_ref[b]


def twopass_scan(x2d, block_rows, *, interpret=False):
    rows = x2d.shape[0]
    nb = rows // block_rows
    sums = pl.pallas_call(
        functools.partial(_blocksum_kernel, rows=block_rows),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((nb,), jnp.uint32),
        interpret=interpret,
    )(x2d)
    offs = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(sums)[:-1]])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda b, o: (b, 0))],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda b, o: (b, 0)),
    )
    return pl.pallas_call(
        _addback_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        interpret=interpret,
    )(offs, x2d)


def bench(tag, fn, x, n):
    f = jax.jit(fn)
    np.asarray(f(x).ravel()[0])
    t = device_time(f, x, k_lo=20, k_hi=220)
    print(f"{tag:46s} {t*1e3:7.3f} ms  {n/t/1e9:7.2f} Gelem/s  "
          f"{2*4*n/t/1e9:6.0f} GB/s", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(rng.integers(0, 8, n, dtype=np.uint64).astype(np.uint32))

    for br in (512, 1024):
        x2d = x.reshape(-1, LANES)
        copy = lambda a, br=br: pl.pallas_call(
            _copy_kernel,
            grid=(a.shape[0] // br,),
            in_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        )(a)
        bench(f"copy through grid (block {br})", copy, x2d, n)

    bench("current streaming scan (512)",
          lambda a: scan_ops.scan_padded(a, interpret=False),
          x.reshape(-1, LANES), n)

    for br in (512, 1024):
        f = lambda a, br=br: pl.pallas_call(
            _scan_kernel_and,
            grid=(a.shape[0] // br,),
            in_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.uint32)],
        )(a)
        ref = np.cumsum(np.asarray(x), dtype=np.uint32) - np.asarray(x)
        out = np.asarray(jax.jit(f)(x.reshape(-1, LANES))).reshape(-1)
        ok = np.array_equal(out, ref)
        bench(f"AND-mask lane shifts (block {br}) ok={ok}", f, x.reshape(-1, LANES), n)

    for br in (512, 1024, 2048):
        f = functools.partial(twopass_scan, block_rows=br)
        ref = np.cumsum(np.asarray(x), dtype=np.uint32) - np.asarray(x)
        out = np.asarray(jax.jit(f)(x.reshape(-1, LANES))).reshape(-1)
        ok = np.array_equal(out, ref)
        bench(f"two-pass parallel (block {br}) ok={ok}", f, x.reshape(-1, LANES), n)


if __name__ == "__main__":
    main()
