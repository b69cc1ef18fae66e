"""Microbenchmark: per-stage cost of the bitonic CE kernel variants on TPU.

Isolates: (a) sublane slicing CE, (b) lane roll CE, (c) pure HBM copy —
to find where the per-element-stage time goes. Run on the real chip.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_radix_sort.runtime import device_time
from tpu_radix_sort.ops import bitonic

N = 1 << 24
ROWS = N // 128
TILE_ROWS = 1024
T = TILE_ROWS * 128


def run_stages(x, stages, n_arr=1, stable=False):
    arrs = tuple(x for _ in range(n_arr))
    out = bitonic._run_network(
        arrs, stable, stages,
        grid=(ROWS // TILE_ROWS,),
        block_shape=(TILE_ROWS, 128),
        index_map=lambda i: (i, 0),
        base_scale=T,
        kernel_rows=TILE_ROWS,
        block_elems=T,
        interpret=False,
    )
    return out[0]


def main():
    x = jax.random.bits(jax.random.PRNGKey(0), (ROWS, 128), dtype=jnp.uint32)

    def bench(name, stages, n_arr=1, stable=False):
        f = jax.jit(lambda a: run_stages(a, stages, n_arr, stable))
        t = device_time(f, x, k_lo=1, k_hi=5)
        per = t / len(stages) if stages else t
        print(f"{name:40s} {t*1e3:8.3f} ms  {per*1e6:8.2f} us/stage  "
              f"{N*len(max(stages,default=[1]))/1e9:.0f}", flush=True)
        return t

    # pure pass-through (1 'stage' that does nothing = HBM r/w cost)
    f0 = jax.jit(lambda a: run_stages(a, [], 1, False))
    t0 = device_time(f0, x, k_lo=1, k_hi=5)
    print(f"{'hbm copy (0 stages)':40s} {t0*1e3:8.3f} ms", flush=True)

    # 16 sublane stages at various strides (k=T so direction is per-block)
    sub16 = [(T, 128 << (i % 10)) for i in range(16)]
    bench("16 sublane stages (1 arr)", sub16)
    bench("16 sublane stages (3 arr stable)", sub16, n_arr=3, stable=True)

    # 16 lane stages
    lane16 = [(T, 1 << (i % 7)) for i in range(16)]
    bench("16 lane stages (1 arr)", lane16)
    bench("16 lane stages (3 arr stable)", lane16, n_arr=3, stable=True)

    # full phase-1 block sort stage list
    p1 = bitonic._block_stages(2, T)
    bench(f"phase1 block sort ({len(p1)} stages)", p1)
    bench(f"phase1 block sort 3arr ({len(p1)})", p1, n_arr=3, stable=True)


if __name__ == "__main__":
    main()
