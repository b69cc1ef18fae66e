"""Microbenchmark: per-stage cost of bitonic CE kernel variants on real TPU.

Isolates, each in ONE pallas_call over 16M elements:
- HBM round-trip (0 stages) — the floor
- 16 sublane roll-CE stages, 1 array (unstable) and 3 arrays (stable)
- 16 lane roll-CE stages, same
- 16 sublane slicing-CE stages (USE_SLICING_CE) — compile-time watch
- dyn_k scalar-up merge stages

Prints ms, us/stage, and effective G(element*stages)/s to compare against
the VPU roofline (~3.8e12 u32 ops/s => ~N ops/element-stage).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import jax
import jax.numpy as jnp
import numpy as np

from tpu_radix_sort.runtime import device_time
from tpu_radix_sort.ops import bitonic

N = 1 << 24
ROWS = N // 128
TILE_ROWS = 1024
T = TILE_ROWS * 128


def run_stages(x, stages, n_arr=1, stable=False, dyn_k=None):
    arrs = tuple(x + i for i in range(n_arr))
    out = bitonic._run_network(
        arrs, stable, stages,
        grid=(ROWS // TILE_ROWS,),
        block_shape=(TILE_ROWS, 128),
        index_map=lambda i: (i, 0),
        base_scale=T,
        kernel_rows=TILE_ROWS,
        block_elems=T,
        interpret=False,
        dyn_k=dyn_k,
    )
    return out[0]


def bench(name, stages, n_arr=1, stable=False, dyn_k=None):
    t0 = time.time()
    f = jax.jit(lambda a: run_stages(a, stages, n_arr, stable, dyn_k))
    x = jax.random.bits(jax.random.PRNGKey(0), (ROWS, 128), dtype=jnp.uint32)
    np.asarray(f(x).ravel()[0])
    compile_s = time.time() - t0
    t = device_time(f, x, k_lo=1, k_hi=5)
    ns = max(1, len(stages))
    print(f"{name:44s} {t*1e3:8.3f} ms  {t/ns*1e6:7.1f} us/st  "
          f"{N*ns/t/1e9:7.1f} Gest/s  (compile {compile_s:.0f}s)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    sub16 = [(T, 128 << (i % 9)) for i in range(16)]
    lane16 = [(T, 1 << (i % 7)) for i in range(16)]
    dyn16 = [(None, 128 << (i % 9)) for i in range(16)]

    bench("hbm copy (0 stages)", [])
    bench("16 sublane roll (1 arr)", sub16)
    bench("16 sublane roll (3 arr stable)", sub16, n_arr=3, stable=True)
    bench("16 lane roll (1 arr)", lane16)
    bench("16 lane roll (3 arr stable)", lane16, n_arr=3, stable=True)
    bench("16 sublane dyn-k scalar-up (1 arr)", dyn16, dyn_k=1 << 25)
    bench("16 sublane dyn-k scalar-up (3 arr)", dyn16, n_arr=3, stable=True,
          dyn_k=1 << 25)

    bitonic.USE_SLICING_CE = True
    try:
        bench("16 sublane SLICING (1 arr)", sub16)
        bench("16 sublane SLICING (3 arr stable)", sub16, n_arr=3, stable=True)
    finally:
        bitonic.USE_SLICING_CE = False


if __name__ == "__main__":
    main()
